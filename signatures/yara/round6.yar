// Round-6 condition-language unlocks, isolated behind the R6_ prefix for
// oracle checking (queries.py q_yara_r6_hits / oracle.py yara_r6_hits_sql).
// Planted triggers live in sources/transcripts.py TEXT_RULES (moduli
// 1051..1091); each rule has a must-fire and a must-NOT-fire probe.

rule R6_Overlap_Count {
    meta:
        description = "overlapping-occurrence counting on a bordered literal: 'aba' occurs 3x overlapping in 'abababa' (non-overlapping counting sees 2 and would NOT fire)"
        score = 55
    strings:
        $o = "aba"
    condition:
        #o >= 3
}

rule R6_Zero_Of {
    meta:
        description = "yara-x '0 of' none-of semantics, desugared to not-any-of; conjunct with a trigger literal keeps the text gate sound"
        score = 60
    strings:
        $t = "r6-trigger"
        $bad1 = "r6-bad-token"
    condition:
        $t and 0 of ($bad*)
}

rule R6_Private_String {
    meta:
        description = "private string modifier: both markers fire the rule; the private one is suppressed from matched_strings output"
        score = 50
    strings:
        $p = "r6-priv-marker" private
        $v = "r6-vis-marker"
    condition:
        any of them
}

rule R6_Lookbehind {
    meta:
        description = "fixed-literal lookbehind prefix, transpiled to a concatenation + report shift (same match set as yara's lookbehind)"
        score = 55
    strings:
        $r = /(?<=token=)[a-z0-9]{6,}/
    condition:
        $r
}

rule R6_Backref {
    meta:
        description = "single-char-class backreference, expanded into the exact finite alternation (RE2 has no backrefs)"
        score = 55
    strings:
        $r = /(['"])r6-value\1/
    condition:
        $r
}

rule R6_Wide_Window {
    meta:
        description = "offset window beyond the old RE2 bounded-repetition cap (codepoint-slice kernels, no '^.{lo,hi}' anchor)"
        score = 50
    strings:
        $s = "r6-late-marker"
    condition:
        $s in (1100..4000)
}
