// Count/offset operator fixture rules (yara-x compiles #/at/in/@ in the
// reference: src/main.rs:780-872). Subset semantics and the loud-rejection
// rules live in loki_rs_spark/signatures/conditions.py.

rule Count_Marker_Three {
    meta:
        score = 58
        description = "repeated marker occurs at least 3 times (#)"
        author = "demo"
    strings:
        $m = "repeat-marker-x"
    condition:
        #m >= 3
}

rule At_Zero_Banner {
    meta:
        score = 52
        description = "banner anchored at turn start ($ at 0)"
    strings:
        $b = "BANNER-AT-ZERO"
    condition:
        $b at 0
}

rule In_Window_Token {
    meta:
        score = 48
        description = "token in the leading window, exactly once (in + #)"
    strings:
        $t = "early-window-token"
    condition:
        $t in (2..8) and #t == 1
}

rule Uint_Banner_Magic {
    meta:
        score = 44
        description = "uint16 magic at offset 0 (the MZ-header idiom)"
    condition:
        uint16(0) == 0x4142
}
