// 'for' offset-quantifier fixture rules (yara-x compiles the general
// iterator; this engine supports the canonical offset idiom
// `for all|any i in (1..#s) : ( @s[i] CMP N )` by desugaring to
// at/in/exists-from primitives — signatures/conditions.py
// _desugar_for_offset). Bundled rules use the `for any` direction only:
// `for all` is vacuously TRUE on zero occurrences (faithful to yara-x),
// which makes it non-monotone under candidate-gate blanking, and one
// such rule disables the pandas-path text gate for the whole set — the
// all-direction is covered by test-local sets in
// tests/test_truth_tables.py instead (same backends, same oracle
// rendering).

rule For_Any_Late_Marker {
    meta:
        score = 40
        description = "some repeat-marker occurrence starts after offset 20 (for any + >)"
        author = "demo"
    strings:
        $m = "repeat-marker-x"
    condition:
        for any i in (1..#m) : ( @m[i] > 20 )
}

rule For_Any_Window_Banner {
    meta:
        score = 35
        description = "some banner occurrence inside the leading 64 chars (for any + <)"
    strings:
        $b = "BANNER-AT-ZERO"
    condition:
        for any i in (1..#b) : ( @b[i] < 64 )
}
