"""xor / base64 string-modifier truth tables, mirroring the reference's
yara-x modifier semantics (src/main.rs:780-872 compiles yara-x 1.12;
trigger style follows the reference's modifier tests in
src/main.rs:1578-2466). Checked across the compile layer (variant
generation), parser forms, loud subset rejections, and the Python/RE2
regex renderings that back all four evaluation engines."""

from __future__ import annotations

import re

import pytest

from loki_rs_spark.signatures.compile import (
    base64_variants,
    boolean_regex,
    validate_string,
    xor_variants,
)
from loki_rs_spark.signatures.conditions import YaraUnsupportedError
from loki_rs_spark.signatures.model import YaraString
from loki_rs_spark.signatures.parsers import parse_yara_rules


def _xor(s: str, key: int) -> str:
    return "".join(chr(ord(c) ^ key) for c in s)


# ---- variant generation ---------------------------------------------------


def test_xor_variants_cover_range_and_drop_high_bytes():
    vs = xor_variants("AB", 0x00, 0x02)
    assert vs == ["AB", "@C", "C@"]
    # keys pushing any byte >= 0x80 are dropped (text-column model)
    assert xor_variants("AB", 0xC0, 0xC1) == []


def test_base64_variants_match_yara_docs_example():
    # yara writingrules docs, base64 modifier example
    assert base64_variants("This program cannot") == [
        "VGhpcyBwcm9ncmFtIGNhbm5vdA",
        "RoaXMgcHJvZ3JhbSBjYW5ub3Q",
        "UaGlzIHByb2dyYW0gY2Fubm90",
    ]


def test_base64_variant_fires_at_each_alignment():
    import base64 as b64

    vs = base64_variants("exfil-the-data")
    for pre in (b"", b"X", b"XY"):
        stream = b64.b64encode(pre + b"exfil-the-data").decode()
        assert any(v in stream for v in vs), pre


# ---- string rendering (the shared regex all four backends use) ------------


def _search(s: YaraString, text: str) -> bool:
    return re.search(boolean_regex(s, "lookaround"), text) is not None


def test_xor_string_matches_keyed_forms_only():
    s = YaraString("$x", "SECRETMARKER", xor_min=0x00, xor_max=0x1F)
    assert _search(s, "enc " + _xor("SECRETMARKER", 0x0A) + " blob")
    assert _search(s, "SECRETMARKER")  # key 0x00 inside range
    assert not _search(s, _xor("SECRETMARKER", 0x20))  # outside range
    single = YaraString("$x", "KEYEDPAYLOAD", xor_min=0x2A, xor_max=0x2A)
    assert _search(single, _xor("KEYEDPAYLOAD", 0x2A))
    assert not _search(single, "KEYEDPAYLOAD")  # plain form excluded


def test_base64_string_drops_raw_form():
    s = YaraString("$b", "exfil-the-data", base64_mod=True)
    assert _search(s, "blob WGV4ZmlsLXRoZS1kYXRhWlo= end")
    assert not _search(s, "plain exfil-the-data mention")


def test_base64wide_matches_interleaved_variant():
    s = YaraString("$b", "exfil-the-data", base64wide=True)
    wide = "".join(c + "\x00" for c in base64_variants("exfil-the-data")[0])
    assert _search(s, "pfx" + wide + "sfx")
    # plain (non-wide) base64 form must NOT fire base64wide-only strings
    assert not _search(s, base64_variants("exfil-the-data")[0])


def test_re2_rendering_agrees_with_duckdb():
    import duckdb

    con = duckdb.connect()
    s = YaraString("$x", "SECRETMARKER", xor_min=0x00, xor_max=0x1F)
    for text, want in [
        ("enc " + _xor("SECRETMARKER", 0x0A) + " blob", True),
        (_xor("SECRETMARKER", 0x20), False),
    ]:
        got = con.execute(
            "SELECT regexp_matches(?, ?)", [text, boolean_regex(s, "re2")]
        ).fetchone()[0]
        assert got == want


# ---- parser forms ---------------------------------------------------------


def _parse_one(mods: str) -> YaraString:
    rules = parse_yara_rules(
        "rule T {\n"
        "    strings:\n"
        f'        $a = "ABCDEF" {mods}\n'
        "    condition:\n"
        "        $a\n"
        "}\n"
    )
    return rules[0].strings[0]


def test_parser_xor_forms():
    bare = _parse_one("xor")
    assert (bare.xor_min, bare.xor_max) == (0x00, 0xFF)
    single = _parse_one("xor(0x2a)")
    assert (single.xor_min, single.xor_max) == (0x2A, 0x2A)
    ranged = _parse_one("xor(0x01-0xff)")
    assert (ranged.xor_min, ranged.xor_max) == (0x01, 0xFF)
    dec = _parse_one("xor(10-20)")
    assert (dec.xor_min, dec.xor_max) == (10, 20)
    b = _parse_one("base64")
    assert b.base64_mod and not b.base64wide
    bw = _parse_one("base64wide")
    assert bw.base64wide and not bw.base64_mod


def test_parser_rejects_custom_base64_alphabet():
    with pytest.raises(YaraUnsupportedError):
        parse_yara_rules(
            "rule T {\n"
            "    strings:\n"
            '        $a = "ABCDEF" base64("abc")\n'
            "    condition:\n"
            "        $a\n"
            "}\n"
        )


# ---- loud subset rejections ----------------------------------------------


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(xor_min=0, xor_max=255, nocase=True),
        dict(xor_min=0, xor_max=255, wide=True),
        dict(xor_min=0, xor_max=255, fullword=True),
        dict(xor_min=0, xor_max=255, base64_mod=True),
        dict(xor_min=5, xor_max=2),  # inverted range
        dict(base64_mod=True, nocase=True),
        dict(base64_mod=True, fullword=True),
        dict(base64_mod=True, wide=True),
    ],
)
def test_invalid_modifier_combos_raise(kwargs):
    with pytest.raises(YaraUnsupportedError):
        validate_string(YaraString("$a", "ABCDEF", **kwargs))


def test_short_base64_literal_raises():
    with pytest.raises(YaraUnsupportedError):
        validate_string(YaraString("$a", "ab", base64_mod=True))


def test_all_high_byte_xor_range_raises():
    with pytest.raises(YaraUnsupportedError):
        validate_string(YaraString("$a", "AB", xor_min=0xC0, xor_max=0xC1))


# ---- custom base64 alphabets (yara base64("...") argument) ---------------

CUSTOM_ALPHA = (
    "!@#$%^&*(){}[].,|ABCDEFGHIJ\tLMNOPQRSTUVWXYZabcdefghijklmnopqrstu"
)


def test_custom_alphabet_variants_are_positional_remaps():
    std = base64_variants("This program cannot")
    custom = base64_variants("This program cannot", CUSTOM_ALPHA)
    table = str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
        CUSTOM_ALPHA,
    )
    assert custom == [v.translate(table) for v in std]
    assert len(custom) == 3


def test_custom_alphabet_matches_encoded_stream():
    """A stream encoded WITH the custom alphabet fires the custom rule
    and not the standard one (and vice versa)."""
    import base64 as b64
    import re as _re

    table = str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
        CUSTOM_ALPHA,
    )
    payload = b"This program cannot"
    enc_custom = b64.b64encode(payload).decode().rstrip("=").translate(table)
    std_s = YaraString("$a", "This program cannot", base64_mod=True)
    cus_s = YaraString(
        "$a", "This program cannot", base64_mod=True,
        base64_alphabet=CUSTOM_ALPHA,
    )
    stream = f"prefix {enc_custom} suffix"
    assert _re.search(boolean_regex(cus_s, "re2"), stream)
    assert not _re.search(boolean_regex(std_s, "re2"), stream)


def test_custom_alphabet_parse_and_rejections():
    import pytest as _pytest

    rules = parse_yara_rules(
        'rule R {\n  strings:\n    $a = "payload" '
        'base64("' + CUSTOM_ALPHA.replace("\t", "\\t") + '")\n'
        "  condition:\n    $a\n}"
    )
    assert rules[0].strings[0].base64_alphabet == CUSTOM_ALPHA
    with _pytest.raises(YaraUnsupportedError, match="64 distinct"):
        parse_yara_rules(
            'rule R {\n  strings:\n    $a = "payload" base64("AAAA")\n'
            "  condition:\n    $a\n}"
        )
    # mismatched alphabets between base64 and base64wide
    a2 = CUSTOM_ALPHA[1:] + CUSTOM_ALPHA[0]
    with _pytest.raises(YaraUnsupportedError, match="different custom"):
        parse_yara_rules(
            'rule R {\n  strings:\n    $a = "payload" '
            'base64("' + CUSTOM_ALPHA.replace("\t", "\\t") + '") '
            'base64wide("' + a2.replace("\t", "\\t") + '")\n'
            "  condition:\n    $a\n}"
        )
