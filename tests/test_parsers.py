"""Signature-parser truth tables, ported from the reference's unit tests
(src/main.rs:1578-2466): hash-type detection, score validity windows,
2-vs-3-column handling, comment-as-description, fp-regex compile failures,
C2 minimum length and case folding, YARA meta extraction."""

from __future__ import annotations

from loki_rs_spark.signatures import (
    hash_type_of,
    load_signature_set,
    parse_c2_iocs,
    parse_filename_iocs,
    parse_hash_iocs,
    parse_yara_rules,
)

from .conftest import SIG_DIR


def test_hash_type_by_length():
    assert hash_type_of("d41d8cd98f00b204e9800998ecf8427e") == "md5"
    assert hash_type_of("da39a3ee5e6b4b0d3255bfef95601890afd80709") == "sha1"
    assert (
        hash_type_of(
            "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
        )
        == "sha256"
    )
    assert hash_type_of("abcd") is None
    assert hash_type_of("z" * 32) is None  # non-hex


def test_hash_ioc_formats():
    text = """
# comment
d41d8cd98f00b204e9800998ecf8427e;55;three column
da39a3ee5e6b4b0d3255bfef95601890afd80709;two column default
e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855;999;invalid score
AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA;not-a-number;desc as score column
short;50;skipped
"""
    iocs = {h.hash_value: h for h in parse_hash_iocs(text)}
    assert iocs["d41d8cd98f00b204e9800998ecf8427e"].score == 55
    assert iocs["da39a3ee5e6b4b0d3255bfef95601890afd80709"].score == 75
    assert (
        iocs[
            "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
        ].score
        == 75
    )
    # non-numeric score column => 2-column format, col1 becomes description
    low = iocs["aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"]
    assert low.score == 75 and low.description == "not-a-number"
    assert "short" not in iocs
    # sorted for determinism
    values = [h.hash_value for h in parse_hash_iocs(text)]
    assert values == sorted(values)


def test_hash_ioc_duplicates_first_wins():
    # Aggregated feeds repeat hashes; the reference's binary search yields
    # exactly one IOC per probe, so the parser must dedupe (first wins) or
    # the broadcast left join fans out duplicate routed rows.
    text = """
d41d8cd98f00b204e9800998ecf8427e;55;first
d41d8cd98f00b204e9800998ecf8427e;90;second
"""
    iocs = parse_hash_iocs(text)
    assert len(iocs) == 1
    assert iocs[0].score == 55 and iocs[0].description == "first"


def test_filename_ioc_comment_description_and_fp():
    text = """
# Mimikatz credential dumper
mimikatz;90
plain_default
# next block
bad[;60
evil;85;goodsub
evil2;300
"""
    iocs = parse_filename_iocs(text)
    by_pattern = {i.pattern: i for i in iocs}
    assert by_pattern["mimikatz"].description == "Mimikatz credential dumper"
    assert by_pattern["mimikatz"].score == 90
    assert by_pattern["plain_default"].score == 75
    assert "bad[" not in by_pattern  # invalid regex skipped
    assert by_pattern["evil"].fp_pattern == "goodsub"
    assert by_pattern["evil2"].score == 75  # out-of-window score -> default


def test_c2_parse():
    text = """
# APT infrastructure
EVIL-C2.example.COM;95
ab
10.0.0.1
short;x
"""
    iocs = parse_c2_iocs(text)
    servers = {c.server: c for c in iocs}
    assert servers["evil-c2.example.com"].score == 95
    assert servers["evil-c2.example.com"].description == "APT infrastructure"
    assert "ab" not in servers  # < 4 chars
    assert servers["10.0.0.1"].score == 75
    assert servers["short"].score == 75  # non-numeric score -> default


def test_yara_subset_parse():
    text = """
rule Demo_One : tag1 {
    meta:
        score = 90
        description = "demo rule"
        author = "a"
        reference = "https://x"
    strings:
        $a = "netcat"
        $b = /me+terpreter/ nocase
    condition:
        all of them
}
rule Default_Score {
    strings:
        $s = "marker"
    condition:
        any of them
}
"""
    rules = parse_yara_rules(text)
    assert [r.name for r in rules] == ["Demo_One", "Default_Score"]
    one = rules[0]
    assert one.score == 90 and one.description == "demo rule"
    assert one.condition == "all of them"
    assert one.strings[0].pattern == "netcat" and not one.strings[0].is_regex
    assert one.strings[1].is_regex and one.strings[1].nocase
    assert rules[1].score == 75  # default when meta.score absent


def test_comment_stripping_is_quote_aware():
    text = (
        "// rule set: this comment must not parse as a rule {\n"
        "rule R { // trailing\n"
        "  strings:\n"
        '    $a = "http://x//y" // looks like a comment inside a string\n'
        "  condition:\n"
        "    any of them // tail\n"
        "}\n"
    )
    rules = parse_yara_rules(text)
    assert [r.name for r in rules] == ["R"]
    assert rules[0].strings[0].pattern == "http://x//y"
    assert rules[0].condition == "any of them"


def test_bundled_corpus_loads():
    sigs = load_signature_set(SIG_DIR)
    assert {h.hash_type for h in sigs.hash_iocs} == {"md5", "sha1", "sha256"}
    # the deliberately-invalid 250 score fell back to 75
    assert all(0 < h.score <= 100 for h in sigs.hash_iocs)
    assert len(sigs.fp_hashes) == 1
    assert len(sigs.filename_iocs) == 5
    assert [c.server for c in sigs.c2_iocs] == [
        "evil-c2.example.com",
        "203.0.113.66",
        "badcdn.net",
    ]
    # files load in sorted-name order (O6): count_offset < demo < extvars
    assert [r.name for r in sigs.yara_rules] == [
        "Count_Marker_Three",
        "At_Zero_Banner",
        "In_Window_Token",
        "Uint_Banner_Magic",
        "EICAR_Test_Payload",
        "Netcat_Shell",
        "Meterpreter_Indicator",
        "ExtVar_Exe_Netcat",
        "ExtVar_Mimikatz_Name",
        "ExtVar_OfSet_Indicators",
        "Fullword_Probe",
        "Size_Long_Netcat_Session",
        "Size_Beacon_Min_Window",
        "Size_Exact_Replaced_Payload",
        "Size_KB_Suffix_Floor",
        "For_Any_Late_Marker",
        "For_Any_Window_Banner",
        "R6_Overlap_Count",
        "R6_Zero_Of",
        "R6_Private_String",
        "R6_Lookbehind",
        "R6_Backref",
        "R6_Wide_Window",
        "Xor_Hidden_Marker",
        "Xor_Single_Key",
        "B64_Exfil_Marker",
    ]
    assert sigs.yara_rules[6].score == 75
    # ext-var conditions parse to ASTs and a stringless rule is legal
    assert sigs.yara_rules[8].strings == ()
    assert sigs.yara_rules[9].condition == '1 of ($ind*) and owner == "assistant"'
    assert sigs.yara_rules[10].strings[0].fullword
    # count/offset/uint conditions survive the loader round-trip
    assert sigs.yara_rules[0].condition == "#m >= 3"
    assert sigs.yara_rules[1].condition == "$b at 0"
    assert sigs.yara_rules[2].condition == "$t in (2..8) and #t == 1"
    assert sigs.yara_rules[3].condition == "uint16(0) == 0x4142"
    assert sigs.yara_rules[3].strings == ()


# ---- ADVICE r5 regression tests -------------------------------------------


def test_private_global_detection_only_in_header_position():
    """The private/global check must not fire on those words inside meta
    values or string literals (ADVICE r5: a description like 'detects
    private rule kit' falsely rejected an entire valid ruleset)."""
    import pytest

    from loki_rs_spark.signatures.conditions import YaraUnsupportedError

    ok = (
        'rule Kit {\n  meta:\n    description = "detects private rule kit"\n'
        '  strings:\n    $a = "global rule marker"\n'
        "  condition:\n    any of them\n}"
    )
    rules = parse_yara_rules(ok)
    assert [r.name for r in rules] == ["Kit"]
    # regex literal containing the words is fine too
    ok2 = (
        "rule R2 {\n  strings:\n    $a = /private rule \\w+/\n"
        "  condition:\n    any of them\n}"
    )
    assert [r.name for r in parse_yara_rules(ok2)] == ["R2"]
    # a real `global rule` header rejects loudly, any order/position
    for header in ("global rule", "global private rule"):
        bad = (
            'rule A {\n  strings:\n    $a = "x"\n  condition:\n'
            "    any of them\n}\n"
            f'{header} Hidden {{\n  strings:\n    $h = "y"\n'
            "  condition:\n    any of them\n}"
        )
        with pytest.raises(YaraUnsupportedError, match="Hidden"):
            parse_yara_rules(bad)


def test_private_rule_loaded_validated_and_suppressed():
    """`private rule` carries yara-x semantics: its own matches are never
    reported, and with no rule-reference grammar it can influence nothing
    — so it parses (full validation) and is dropped from the output."""
    import pytest

    from loki_rs_spark.signatures.conditions import YaraUnsupportedError

    src = (
        'private rule Helper {\n  strings:\n    $h = "helper-marker"\n'
        "  condition:\n    any of them\n}\n"
        'rule Vis {\n  strings:\n    $a = "x"\n'
        "  condition:\n    any of them\n}"
    )
    assert [r.name for r in parse_yara_rules(src)] == ["Vis"]
    # indented private header also recognized (dropped, not mis-reported)
    assert (
        parse_yara_rules(
            '  private rule P {\n  strings:\n    $a = "x"\n'
            "  condition:\n    any of them\n}"
        )
        == []
    )
    # a private rule still VALIDATES: unsupported constructs reject loudly
    with pytest.raises(YaraUnsupportedError):
        parse_yara_rules(
            "private rule Bad {\n  condition:\n    entrypoint == 4\n}"
        )


def test_mixed_bare_and_custom_base64_rejects():
    """yara errors when a bare base64/base64wide sits next to a custom-
    alphabet form; silently applying the custom alphabet to both would
    diverge from yara-x (ADVICE r5)."""
    import pytest

    from loki_rs_spark.signatures.conditions import YaraUnsupportedError

    alpha = (
        "!@#$%^&*(){}[].,|ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstu"
    )
    assert len(set(alpha)) == 64

    def rule(mods: str) -> str:
        return (
            f'rule R {{\n  strings:\n    $a = "secret" {mods}\n'
            "  condition:\n    any of them\n}"
        )

    with pytest.raises(YaraUnsupportedError, match="bare base64"):
        parse_yara_rules(rule(f'base64 base64wide("{alpha}")'))
    with pytest.raises(YaraUnsupportedError, match="bare base64"):
        parse_yara_rules(rule(f'base64("{alpha}") base64wide'))
    # both-custom-same-alphabet stays accepted
    rules = parse_yara_rules(rule(f'base64("{alpha}") base64wide("{alpha}")'))
    assert rules[0].strings[0].base64_alphabet == alpha
    # bare+bare stays accepted (both standard alphabet)
    rules = parse_yara_rules(rule("base64 base64wide"))
    assert rules[0].strings[0].base64_alphabet is None


def test_shared_regex_possessive_bounded_quantifier_rejects():
    """{m,n}+ is Java/Python-3.11+-only; it must reject at load time, not
    surface as an RE2 kernel error in the pyarrow backend (ADVICE r5)."""
    import pytest

    from loki_rs_spark.signatures.compile import validate_shared_regex
    from loki_rs_spark.signatures.conditions import YaraUnsupportedError

    for pat in ("a{2,3}+b", "a{2}+b", "a{2,}+b"):
        with pytest.raises(YaraUnsupportedError, match="possessive"):
            validate_shared_regex(pat)
    # non-possessive bounded forms still pass
    for pat in ("a{2,3}b", "a{2,3}?b", "(a){2}", "a{2,}b"):
        validate_shared_regex(pat)
    # a bare '{' that doesn't form a quantifier is LITERAL in python/RE2
    # but an 'Illegal repetition' error in Java (verified against JDK 17)
    # -> outside the shared dialect, rejected loudly
    for pat in ("a{x}+", "a{x}", "a{", "a{,3}"):
        with pytest.raises(YaraUnsupportedError, match="repetition"):
            validate_shared_regex(pat)
    validate_shared_regex(r"a\{x}")  # escaped brace is fine everywhere


def test_shared_regex_class_leading_bracket():
    """[]a] / [^]a]-style classes (leading ']' is literal — verified
    accepted by Java 17, Python 3.11 and RE2): the tracker must not close
    the class on the leading ']' and then validate the tail in the wrong
    mode."""
    import pytest

    from loki_rs_spark.signatures.compile import validate_shared_regex
    from loki_rs_spark.signatures.conditions import YaraUnsupportedError

    # all three engines accept the POSIX leading-']' idiom -> passes
    validate_shared_regex("[]a]b")
    validate_shared_regex("[^]a]b")
    validate_shared_regex(r"[\]a]b")
    # the broken tracker closed the class at the leading ']' and then
    # validated CLASS-INTERIOR text in outside mode — falsely rejecting
    # valid patterns like []*+] ("possessive *+") and []{x}] (bare brace)
    validate_shared_regex("[]*+]")
    validate_shared_regex("[^]{x}]")
    # a lookahead genuinely after the class must still reject by name
    with pytest.raises(YaraUnsupportedError, match="lookaround"):
        validate_shared_regex("[]a](?=x)")
    with pytest.raises(YaraUnsupportedError, match="lookaround"):
        validate_shared_regex("[^]a](?=x)")
