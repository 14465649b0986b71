// filesize condition fixture rules: yara's `filesize` global (the
// scanned data's byte size; the reference compiles full yara-x,
// src/main.rs:780-872) mapped to the turn text's character length —
// char == byte on this engine's ASCII text model, and the same length
// convention as the F7 size filter. Parsing/backends in
// signatures/conditions.py (SizeCmp). Bundled rules use only the
// GATE-SAFE comparison directions (>, >=, ==): blanked text has length
// 0, so <, <=, != could fire on a gated-blank row and would disable the
// candidate text gate for the whole set (condition_negates_strings);
// those directions are covered by test-local rule sets in
// tests/test_truth_tables.py instead.

rule Size_Long_Netcat_Session {
    meta:
        score = 55
        description = "netcat marker in a long turn (string AND filesize >)"
        author = "demo"
    strings:
        $s = "netcat"
    condition:
        $s and filesize > 300
}

rule Size_Beacon_Min_Window {
    meta:
        score = 50
        description = "c2 beacon marker with a minimum size gate (>=)"
    strings:
        $b = "beacon to evil-c2"
    condition:
        $b and filesize >= 200
}

rule Size_Exact_Replaced_Payload {
    meta:
        score = 45
        description = "exact-size turn: the fixed replace payload (==, no strings)"
    condition:
        filesize == 24
}

rule Size_KB_Suffix_Floor {
    meta:
        score = 30
        description = "KB suffix parse coverage: fires only on turns >= 1KB"
    condition:
        filesize >= 1KB
}
