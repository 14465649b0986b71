// YARA acceptance-survey corpus — hex-string and regex section.
// See strings_literals.yar header for scope and methodology.

rule SUSP_Hex_Fixed_Bytes {
    meta:
        description = "fixed-byte hex string (printable range)"
        score = 60
    strings:
        $h1 = { 4D 5A 40 00 }
    condition:
        $h1
}

rule SUSP_Hex_Wildcards {
    meta:
        description = "hex with ?? wildcards"
        score = 60
    strings:
        $h1 = { 25 3F ?? 3D 7A }
    condition:
        $h1
}

rule SUSP_Hex_Jumps {
    meta:
        description = "hex with [n] and [n-m] jumps"
        score = 60
    strings:
        $h1 = { 68 74 74 70 [0-4] 3A 2F 2F }
    condition:
        $h1
}

rule SUSP_Hex_Alternation {
    meta:
        description = "hex alternation ( A | B )"
        score = 60
    strings:
        $h1 = { 70 6F 77 65 72 ( 73 68 | 70 74 ) }
    condition:
        $h1
}

rule SUSP_Hex_Nested_Alternation {
    meta:
        description = "nested hex alternations"
        score = 60
    strings:
        $h1 = { 63 6D ( 64 ( 2E | 5F ) | 73 ) 65 }
    condition:
        $h1
}

rule REJ_Hex_High_Bytes {
    meta:
        description = "hex bytes >= 0x80 (binary payloads) — text model rejects"
        score = 70
    strings:
        $h1 = { E8 00 00 00 00 5D }
    condition:
        $h1
}

rule REJ_Hex_Jump_In_Alternation {
    meta:
        description = "jump inside alternation — yara-x also forbids"
        score = 60
    strings:
        $h1 = { 41 ( 42 [2] 43 | 44 ) }
    condition:
        $h1
}

rule SUSP_Regex_Simple {
    meta:
        description = "simple regex with classes and repetition"
        score = 60
    strings:
        $r1 = /eval\(base64_decode\([A-Za-z0-9+\/=]{16,}\)\)/
    condition:
        $r1
}

rule SUSP_Regex_Alternation_Anchors {
    meta:
        description = "regex with alternation and anchors"
        score = 55
    strings:
        $r1 = /^(GET|POST) \/[a-z]{8}\.php/
    condition:
        $r1
}

rule SUSP_Regex_Nocase_Flag {
    meta:
        description = "regex with nocase modifier"
        score = 55
    strings:
        $r1 = /select.{1,40}from.{1,40}information_schema/ nocase
    condition:
        $r1
}

rule SUSP_Regex_Escapes {
    meta:
        description = "regex with \\d \\s \\w escapes and bounded reps"
        score = 50
    strings:
        $r1 = /User-Agent: [\w\-]{3,20}\/\d{1,2}\.\d{1,2}/
    condition:
        $r1
}

rule SUSP_Regex_Lookbehind_Literal {
    meta:
        description = "fixed literal lookbehind prefix — transpiled to a concatenation + report shift (same match set, yara-identical matched data)"
        score = 50
    strings:
        $r1 = /(?<=password=)[^&]{8,}/
    condition:
        $r1
}

rule SUSP_Regex_Backref_Class {
    meta:
        description = "single-char-class backreference — expanded into the exact finite alternation, shared-dialect"
        score = 50
    strings:
        $r1 = /(['"]).{4,16}\1/
    condition:
        $r1
}

rule SUSP_Regex_Fullword {
    meta:
        description = "fullword on a regex string"
        score = 50
    strings:
        $r1 = /wget|curl/ fullword
    condition:
        $r1
}
