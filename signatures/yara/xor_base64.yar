// xor / base64 modifier fixture rules. The reference compiles full
// yara-x (src/main.rs:780-872), where these modifiers expand a literal
// into its keyed/encoded variants; loki_rs_spark/signatures/compile.py
// renders them as a single regex alternation shared by all four
// evaluation backends (arrow kernels, pandas, Catalyst rlike, DuckDB
// oracle). Planted triggers: sources/transcripts.py TEXT_RULES
// (moduli 1033/1039/1049).

rule Xor_Hidden_Marker {
    meta:
        score = 66
        description = "single-byte-xor'd marker, key range 0x00-0x1f"
        author = "demo"
    strings:
        $x = "SECRETMARKER" xor(0x00-0x1f)
    condition:
        $x
}

rule Xor_Single_Key {
    meta:
        score = 61
        description = "marker xor'd with exactly key 0x2a"
    strings:
        $x = "KEYEDPAYLOAD" xor(0x2a)
    condition:
        $x
}

rule B64_Exfil_Marker {
    meta:
        score = 57
        description = "base64-encoded exfil marker (any of 3 alignments)"
    strings:
        $b = "exfil-the-data" base64
    condition:
        $b
}
