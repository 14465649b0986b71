// YARA acceptance-survey corpus — string/literal-modifier section.
//
// PURPOSE: measure the engine's yara-x subset acceptance rate on rules
// shaped like the public signature-base corpus (Neo23x0/signature-base,
// the rule source the reference ships with). The sandbox has no network,
// so this corpus is SYNTHETIC-BUT-REPRESENTATIVE: each rule mirrors a
// construction pattern that recurs across the public corpus (meta block
// shape, $s/$x ident families, of-set quantifiers, modifier combos),
// with placeholder indicator content. Rules are NOT loaded by the
// production signature set (signatures/yara/ only); jobs/yara_survey.py
// parses them one block at a time and reports accepted/rejected-by-
// reason counts, pinned by tests/test_yara_survey.py.

rule SUSP_Plain_AnyOf {
    meta:
        description = "plain literals, any of them"
        author = "survey"
        date = "2024-01-15"
        score = 60
    strings:
        $s1 = "mimikatz.exe"
        $s2 = "sekurlsa::logonpasswords"
    condition:
        any of them
}

rule SUSP_Plain_AllOf {
    meta:
        description = "plain literals, all of them"
        score = 75
    strings:
        $s1 = "Invoke-Expression"
        $s2 = "DownloadString"
    condition:
        all of them
}

rule SUSP_Quantified_OfThem {
    meta:
        description = "N of them quantifier"
        score = 65
    strings:
        $a1 = "cmd.exe /c"
        $a2 = "powershell -enc"
        $a3 = "rundll32"
    condition:
        2 of them
}

rule SUSP_OfSet_Wildcard {
    meta:
        description = "of-set with ident wildcard family"
        score = 70
    strings:
        $x1 = "beacon.dll"
        $x2 = "beacon.x64.dll"
        $s1 = "not-in-the-set"
    condition:
        1 of ($x1, $x2) and $s1
}

rule SUSP_Nocase_Literal {
    meta:
        description = "nocase modifier"
        score = 55
    strings:
        $s1 = "EvilCorp" nocase
    condition:
        $s1
}

rule SUSP_Fullword_Literal {
    meta:
        description = "fullword modifier"
        score = 55
    strings:
        $s1 = "svch0st" fullword
    condition:
        $s1
}

rule SUSP_Wide_Literal {
    meta:
        description = "wide modifier (utf-16le interleave)"
        score = 55
    strings:
        $s1 = "AppData\\Roaming" wide
    condition:
        $s1
}

rule SUSP_WideAscii_Literal {
    meta:
        description = "wide ascii both-encodings"
        score = 55
    strings:
        $s1 = "LoadLibraryA" wide ascii
    condition:
        $s1
}

rule SUSP_Nocase_Fullword_Combo {
    meta:
        description = "nocase + fullword combined"
        score = 60
    strings:
        $s1 = "lsass" nocase fullword
    condition:
        $s1
}

rule SUSP_Xor_Literal {
    meta:
        description = "xor modifier, default key range"
        score = 70
    strings:
        $s1 = "http://stage.example" xor
    condition:
        $s1
}

rule SUSP_Xor_Range_Literal {
    meta:
        description = "xor with explicit key range"
        score = 70
    strings:
        $s1 = "GetProcAddress" xor(0x01-0x10)
    condition:
        $s1
}

rule SUSP_Base64_Literal {
    meta:
        description = "base64 modifier"
        score = 70
    strings:
        $s1 = "This program cannot" base64
    condition:
        $s1
}

rule SUSP_Base64Wide_Literal {
    meta:
        description = "base64wide modifier"
        score = 70
    strings:
        $s1 = "PowerShell" base64wide
    condition:
        $s1
}

rule REJ_Xor_Nocase_Combo {
    meta:
        description = "xor + nocase — yara allows, subset rejects loudly"
        score = 70
    strings:
        $s1 = "staging" xor nocase
    condition:
        $s1
}

rule SUSP_Base64_Custom_Alphabet {
    meta:
        description = "base64 with a custom 64-char alphabet — positional remap of the standard encoding, supported"
        score = 70
    strings:
        $s1 = "payload" base64("!@#$%^&*(){}[].,|ABCDEFGHIJ\x09LMNOPQRSTUVWXYZabcdefghijklmnopqrstu")
    condition:
        $s1
}

rule REJ_Base64_Bad_Alphabet {
    meta:
        description = "base64 alphabet that is not 64 distinct chars — rejected at load"
        score = 70
    strings:
        $s1 = "payload" base64("AAAA")
    condition:
        $s1
}

rule SUSP_Private_String_Modifier {
    meta:
        description = "private string modifier — matches feed the condition, suppressed from matched_strings output"
        score = 50
    strings:
        $s1 = "internal-only" private
    condition:
        $s1
}

rule SUSP_Escaped_Literal {
    meta:
        description = "escapes in literals (\\x hex, tab, quote)"
        score = 50
    strings:
        $s1 = "say \"hi\"\tto\x20me"
    condition:
        $s1
}

rule SUSP_NonAscii_Escaped_Literal {
    meta:
        description = "plain literal with \xHH escapes beyond ASCII — a STRING column holds those characters, so unmodified non-ascii literals stay supported (only hex strings / xor / base64 / uint reject high bytes)"
        score = 50
    strings:
        $s1 = "marker\xc3\xa9tail"
    condition:
        $s1
}
