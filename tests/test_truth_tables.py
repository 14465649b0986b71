"""Match-semantics truth tables ported from the reference's unit tests
(src/main.rs:1578-2466), executed against BOTH the pure-Python reference
scanner and the real Spark pipeline on micro-fixture turns."""

from __future__ import annotations

import hashlib

import pytest

from loki_rs_spark.config import ScanConfig
from loki_rs_spark.plans.pipeline import scan_transcripts
from loki_rs_spark.plans.reference_scanner import scan_turn
from loki_rs_spark.signatures.model import (
    C2IOC,
    FilenameIOC,
    HashIOC,
    SignatureSet,
    YaraRule,
    YaraString,
)

CFG = ScanConfig(exclude_patterns=())


def _sigs(**kwargs) -> SignatureSet:
    return SignatureSet(**{k: tuple(v) for k, v in kwargs.items()})


def _turn_df(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (f"c{i}", i, "user", text, tool)
            for i, (text, tool) in enumerate(rows)
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    return df.withColumn("ts", F.lit("2026-01-01").cast("timestamp"))


def _routed_levels(spark, rows, sigs):
    result = scan_transcripts(spark, _turn_df(spark, rows), sigs, CFG)
    return {
        r["turn_idx"]: (r["level"], r["score"], [x["message"] for x in r["reasons"]])
        for r in result.routed.collect()
    }


# ---- C2 matching truth table (src/main.rs:612-651 tests) ----------------

C2_SIGS = _sigs(
    c2_iocs=[
        C2IOC("evildomain.com", 80, ""),
        C2IOC("10.20.30.40", 85, ""),
    ]
)


@pytest.mark.parametrize(
    "text,hit",
    [
        ("connect evildomain.com now", True),  # exact domain
        ("connect dga1.evildomain.com now", True),  # subdomain suffix
        ("connect EVILDOMAIN.COM now", True),  # case-insensitive (lowered)
        ("connect notevildomain.org now", False),
        ("connect 10.20.30.40 now", True),  # IP exact
        ("connect 110.20.30.40 now", False),  # IP no suffix matching
        ("connect 10.20.30.41 now", False),
    ],
)
def test_c2_truth_table(spark, text, hit):
    ref = scan_turn("c0", 0, text, "tool-x", C2_SIGS, CFG)
    assert (ref is not None) == hit
    routed = _routed_levels(spark, [(text, "tool-x")], C2_SIGS)
    assert (0 in routed) == hit
    if hit:
        assert routed[0][2][0].startswith("C2 IOC match")


# Out-of-range octets are NOT IPs (reference is_ip_address requires 0-255,
# src/main.rs:612-651): "999.12.34.56" falls through to domain SUFFIX
# matching, so a C2 entry "12.34.56" hits it while a true IP entry never
# suffix-matches.
OCTET_SIGS = _sigs(c2_iocs=[C2IOC("12.34.56", 80, "")])


@pytest.mark.parametrize(
    "text,hit",
    [
        ("connect 999.12.34.56 now", True),  # not an IP -> suffix match
        ("connect 9.12.34.56 now", False),  # valid IP -> exact only
    ],
)
def test_c2_out_of_range_octet(spark, text, hit):
    ref = scan_turn("c0", 0, text, "tool-x", OCTET_SIGS, CFG)
    assert (ref is not None) == hit
    routed = _routed_levels(spark, [(text, "tool-x")], OCTET_SIGS)
    assert (0 in routed) == hit


# ---- filename IOC + fp_regex truth table (src/main.rs tests) -------------

FN_SIGS = _sigs(
    filename_iocs=[
        FilenameIOC(r"mimikatz", 90, "d", None),
        FilenameIOC(r"helper.*\.exe", 65, "d", r"_config\.exe"),
    ]
)


@pytest.mark.parametrize(
    "tool,expected_patterns",
    [
        ("c:/x/mimikatz.exe", ["mimikatz"]),
        ("c:/x/MIMIKATZ.exe", []),  # case-sensitive in the reference
        ("/opt/helper_tool.exe", [r"helper.*\.exe"]),
        ("/opt/helper_config.exe", []),  # fp regex suppresses
        ("/opt/other.exe", []),
    ],
)
def test_filename_fp_truth_table(spark, tool, expected_patterns):
    ref = scan_turn("c0", 0, "benign text", tool, FN_SIGS, CFG)
    got_ref = (
        [r.message.split("PATTERN: ")[1] for r in ref.reasons] if ref else []
    )
    assert got_ref == expected_patterns
    routed = _routed_levels(spark, [("benign text", tool)], FN_SIGS)
    got = (
        [m.split("PATTERN: ")[1] for m in routed[0][2]] if 0 in routed else []
    )
    assert got == expected_patterns


# ---- FP-hash exclusion beats everything (filesystem_scan.rs:854-859) ----


def test_fp_hash_beats_filename_and_yara(spark):
    payload = "TRIGGER-CONTENT-XYZ"
    md5 = hashlib.md5(payload.encode()).hexdigest()
    sigs = _sigs(
        fp_hashes=[HashIOC(md5, "md5", 0, "known good")],
        filename_iocs=[FilenameIOC("mimikatz", 90, "d", None)],
        yara_rules=[
            YaraRule(
                "R", 80, "", "", "",
                (YaraString("$a", "TRIGGER-CONTENT", False, False),),
                "any",
            )
        ],
    )
    # without FP the row would ALERT on filename+yara; with FP it vanishes
    ref = scan_turn("c0", 0, payload, "c:/mimikatz.exe", sigs, CFG)
    assert ref is None
    routed = _routed_levels(spark, [(payload, "c:/mimikatz.exe")], sigs)
    assert routed == {}


# ---- hash IOC: one reason per hash type, all three can fire -------------


def test_hash_ioc_per_type(spark):
    payload = "HASH-ME"
    raw = payload.encode()
    sigs = _sigs(
        hash_iocs=[
            HashIOC(hashlib.md5(raw).hexdigest(), "md5", 70, "m"),
            HashIOC(hashlib.sha1(raw).hexdigest(), "sha1", 70, "s1"),
            HashIOC(hashlib.sha256(raw).hexdigest(), "sha256", 70, "s2"),
        ]
    )
    ref = scan_turn("c0", 0, payload, "tool-x", sigs, CFG)
    assert ref is not None and ref.n_reasons == 3
    # score of [70,70,70] -> 83.9125 -> 84 -> ALERT
    assert ref.score == 84 and ref.level == "ALERT"
    routed = _routed_levels(spark, [(payload, "tool-x")], sigs)
    assert routed[0][0] == "ALERT" and routed[0][1] == 84


# ---- discovery order: filename -> hashes -> yara -> c2 -------------------


def test_reason_discovery_order(spark):
    payload = "ORDERED netcat beacon evil.example.net end"
    raw = payload.encode()
    sigs = _sigs(
        hash_iocs=[HashIOC(hashlib.md5(raw).hexdigest(), "md5", 40, "m")],
        filename_iocs=[FilenameIOC("ordertool", 40, "d", None)],
        c2_iocs=[C2IOC("evil.example.net", 40, "")],
        yara_rules=[
            YaraRule(
                "NC", 40, "", "", "",
                (YaraString("$a", "netcat", False, False),),
                "any",
            )
        ],
    )
    cfg = ScanConfig(exclude_patterns=(), max_reasons=10)
    ref = scan_turn("c0", 0, payload, "/bin/ordertool", sigs, cfg)
    kinds = [r.message.split(" ")[0] for r in ref.reasons]
    assert kinds == ["File", "HASH", "YARA", "C2"]
    result = scan_transcripts(
        spark, _turn_df(spark, [(payload, "/bin/ordertool")]), sigs, cfg
    )
    rows = result.routed.collect()
    assert len(rows) == 1
    got = [m["message"].split(" ")[0] for m in rows[0]["reasons"]]
    assert got == ["File", "HASH", "YARA", "C2"]


# ---- below-threshold drop + max_reasons slice ----------------------------


def test_threshold_and_slice(spark):
    sigs = _sigs(filename_iocs=[FilenameIOC("weak", 30, "d", None)])
    assert scan_turn("c0", 0, "x", "weaktool", sigs, CFG) is None
    assert _routed_levels(spark, [("x", "weaktool")], sigs) == {}

    many = _sigs(
        filename_iocs=[
            FilenameIOC(f"multi{i}", 50, "d", None) for i in range(5)
        ]
    )
    tool = "multi0 multi1 multi2 multi3 multi4"
    ref = scan_turn("c0", 0, "x", tool, many, CFG)
    assert ref.n_reasons == 5 and len(ref.reasons) == CFG.max_reasons
    routed = _routed_levels(spark, [("x", tool)], many)
    assert len(routed[0][2]) == CFG.max_reasons
