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
