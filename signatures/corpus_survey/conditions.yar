// YARA acceptance-survey corpus — condition-language section.
// See strings_literals.yar header for scope and methodology.

import "pe"

rule SUSP_Filesize_And_Strings {
    meta:
        description = "the signature-base staple: strings + filesize bound"
        score = 70
    strings:
        $s1 = "CreateRemoteThread"
        $s2 = "VirtualAllocEx"
    condition:
        all of them and filesize < 800KB
}

rule SUSP_Filesize_Range {
    meta:
        description = "filesize window (two bounds)"
        score = 60
    strings:
        $s1 = "UPX0"
    condition:
        $s1 and filesize > 2KB and filesize < 2MB
}

rule SUSP_Uint16_Magic {
    meta:
        description = "uint16(0) MZ-header idiom"
        score = 65
    strings:
        $s1 = "This program cannot be run in DOS mode"
    condition:
        uint16(0) == 0x5a4d and $s1
}

rule SUSP_Uint32_ELF_Magic {
    meta:
        description = "uint32(0) ELF magic — 0x7f454c46 little-endian bytes are all < 0x80, so the text model CAN express it"
        score = 65
    condition:
        uint32(0) == 0x464c457f
}

rule REJ_Uint16_High_Byte {
    meta:
        description = "uint16 whose little-endian bytes include >= 0x80 — text model rejects"
        score = 65
    condition:
        uint16(0) == 0x90eb
}

rule SUSP_Count_Threshold {
    meta:
        description = "occurrence-count condition (border-free literal)"
        score = 55
    strings:
        $s1 = "powershell -enc"
    condition:
        #s1 > 3
}

rule SUSP_Count_SelfOverlap_Literal {
    meta:
        description = "count on a self-overlapping literal ('xor eax, eax' has border 'x') — every backend counts ALL occurrences including overlapping ones (lookahead regexp_count / stepped-walk kernels), matching yara-x"
        score = 55
    strings:
        $s1 = "xor eax, eax"
    condition:
        #s1 > 3
}

rule SUSP_At_Offset {
    meta:
        description = "anchored at-offset condition"
        score = 55
    strings:
        $s1 = "#!/bin/sh"
    condition:
        $s1 at 0
}

rule SUSP_In_Range {
    meta:
        description = "offset-window condition"
        score = 55
    strings:
        $s1 = "<?php"
    condition:
        $s1 in (0..64)
}

rule SUSP_Nth_Occurrence_Offset {
    meta:
        description = "@-array i-th occurrence offset (UDF backends only)"
        score = 55
    strings:
        $s1 = "segment-marker"
    condition:
        @s1[2] < 512
}

rule SUSP_ExtVar_Filename {
    meta:
        description = "external variable: filename endswith"
        score = 60
    strings:
        $s1 = "DllRegisterServer"
    condition:
        $s1 and filename endswith ".dll"
}

rule SUSP_ExtVar_Extension_Filetype {
    meta:
        description = "external variables: extension + filetype"
        score = 60
    strings:
        $s1 = "AutoOpen"
    condition:
        $s1 and extension iequals "docm" and filetype != "EXECUTABLE"
}

rule SUSP_ExtVar_Regex_Match {
    meta:
        description = "external variable regex match"
        score = 55
    strings:
        $s1 = "suspicious"
    condition:
        $s1 and filepath matches /\/(tmp|dev\/shm)\//
}

rule SUSP_Boolean_Nesting {
    meta:
        description = "nested boolean structure with not"
        score = 60
    strings:
        $a1 = "persist"
        $a2 = "schtasks /create"
        $fp1 = "unit-test-fixture"
    condition:
        (any of ($a1, $a2)) and not $fp1
}

rule REJ_PE_Module {
    meta:
        description = "pe module — modules are outside the subset"
        score = 70
    condition:
        pe.is_pe and pe.number_of_sections > 8
}

rule SUSP_For_All_Window {
    meta:
        description = "canonical for-all offset idiom (every occurrence in the leading window) — desugars to NOT exists-from"
        score = 60
    strings:
        $s1 = "section"
    condition:
        for all i in (1..#s1) : ( @s1[i] < 512 )
}

rule SUSP_For_Bound_Wide {
    meta:
        description = "for-all offset bound beyond 1000 — supported: the pyarrow kernels slice by codepoint, no RE2 bounded-repetition anchor remains"
        score = 60
    strings:
        $s1 = "section"
    condition:
        for all i in (1..#s1) : ( @s1[i] < 2048 )
}

rule REJ_For_General_Body {
    meta:
        description = "general for-body (cross-string comparison) — outside the canonical offset idiom"
        score = 60
    strings:
        $s1 = "alpha"
        $s2 = "omega"
    condition:
        for all i in (1..#s1) : ( @s1[i] < @s2[i] )
}

rule REJ_Entrypoint {
    meta:
        description = "legacy entrypoint global — unsupported"
        score = 50
    condition:
        entrypoint == 0x1000
}

rule SUSP_Zero_Of_Them {
    meta:
        description = "0 of them — yara-x NONE-of semantics, desugared to not-any-of (gate auto-disabled)"
        score = 40
    strings:
        $s1 = "clean-marker"
    condition:
        0 of them
}

rule SUSP_Stringless_Size_Probe {
    meta:
        description = "condition-only rule (no strings section)"
        score = 40
    condition:
        filesize > 1MB
}

private rule SUSP_Private_Helper_Marker {
    meta:
        description = "private helper rule — loaded + validated, own matches suppressed (yara-x semantics; no rule-reference grammar can consume it)"
        score = 0
    strings:
        $s1 = "helper-marker"
    condition:
        $s1
}

rule SUSP_Percent_Of_Them {
    meta:
        description = "percentage quantifier — resolved to ceil(P*n/100)-of at load time, all backends"
        score = 50
    strings:
        $s1 = "stage-one"
        $s2 = "stage-two"
        $s3 = "stage-three"
    condition:
        67% of them
}

rule SUSP_None_Of_Keyword {
    meta:
        description = "'none of' keyword spelling (yara 4.3+/yara-x) — same none-of desugar as '0 of'"
        score = 45
    strings:
        $t1 = "loader-stub"
        $w1 = "whitelisted-vendor"
    condition:
        $t1 and none of ($w*)
}
