"""scan_start/scan_end bracket events + context map + error counter
(SURVEY.md §2.1 S5; reference src/helpers/unified_logger.rs:706-735,
LogEvent context map at :97-98). Field-shape parity is checked against the
reference's own tests/fixtures/minimal.jsonl."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from loki_rs_spark.config import ScanConfig
from loki_rs_spark.operators.route import scan_counters
from loki_rs_spark.plans.pipeline import scan_transcripts
from loki_rs_spark.sources.jsonl import read_jsonl_events, write_jsonl_scan

REF_FIXTURE = Path("/root/reference/tests/fixtures/minimal.jsonl")

CFG = ScanConfig(exclude_patterns=())


def _tiny_scan(spark, sigs):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("c0", 0, "user", "EICAR-TEST-PAYLOAD-ALPHA", "tool-1"),
            ("c0", 1, "user", "nothing here", "tool-2"),
            ("c1", 0, "tool", None, "tool-3"),  # corrupt row -> error count
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    df = df.withColumn("ts", F.lit("2026-01-01").cast("timestamp"))
    return scan_transcripts(spark, df, sigs, CFG)


def test_bracketed_jsonl_roundtrip(spark, sigs, tmp_path):
    result = _tiny_scan(spark, sigs)
    counters = scan_counters(result.scanned, result.evaluated).collect()[0]
    assert counters["errors"] == 1  # the NULL-text row
    out = str(tmp_path / "scan.jsonl")
    write_jsonl_scan(
        spark,
        result.routed,
        out,
        counters.asDict(),
        hostname="test-host",
        version="0.2.0",
        started_iso="2026-01-12T08:59:01+00:00",
        ended_iso="2026-01-12T08:59:10+00:00",
        duration_sec=9.0,
        context={"run_id": "r42", "sig_rev": "abc"},
    )
    lines = [
        json.loads(ln)
        for part in sorted(Path(out).glob("part-*"))
        for ln in part.read_text().splitlines()
    ]
    by_type = {}
    for ev in lines:
        by_type.setdefault(ev["event_type"], []).append(ev)
    assert len(by_type["scan_start"]) == 1
    assert len(by_type["scan_end"]) == 1
    assert len(by_type["turn_match"]) >= 1

    start = by_type["scan_start"][0]
    end = by_type["scan_end"][0]
    assert start["level"] == "INFO" and end["level"] == "INFO"
    assert start["message"].startswith("Loki-RS scan started VERSION: ")
    assert end["message"].startswith("Loki-RS scan finished. Summary - ")
    assert "Turns scanned: 3 Matched:" in end["message"]
    assert start["context"] == {"run_id": "r42", "sig_rev": "abc"}

    # PERMISSIVE re-read (S9) sees all three event types
    events = read_jsonl_events(spark, out)
    assert events.count() == len(lines)


def test_bracket_field_shape_matches_reference_fixture(spark, sigs, tmp_path):
    """Every field our scan_start/scan_end emit must exist in the
    reference's own fixture events of the same type (no invented fields;
    context is legitimately absent there — serde skips empty maps)."""
    if not REF_FIXTURE.exists():
        pytest.skip("reference fixture unavailable")
    ref_events = [
        json.loads(ln) for ln in REF_FIXTURE.read_text().splitlines() if ln
    ]
    ref_keys = {
        ev["event_type"]: set(ev) for ev in ref_events
    }
    result = _tiny_scan(spark, sigs)
    counters = scan_counters(result.scanned, result.evaluated).collect()[0]
    out = str(tmp_path / "scan.jsonl")
    write_jsonl_scan(spark, result.routed, out, counters.asDict())
    ours = [
        json.loads(ln)
        for part in sorted(Path(out).glob("part-*"))
        for ln in part.read_text().splitlines()
    ]
    for ev in ours:
        if ev["event_type"] not in ("scan_start", "scan_end"):
            continue
        extra = set(ev) - ref_keys[ev["event_type"]] - {"context"}
        assert not extra, f"invented fields vs reference shape: {extra}"
        missing = ref_keys[ev["event_type"]] - set(ev)
        assert not missing, f"missing reference fields: {missing}"


def test_context_map_skipped_when_empty(spark, sigs, tmp_path):
    result = _tiny_scan(spark, sigs)
    counters = scan_counters(result.scanned, result.evaluated).collect()[0]
    out = str(tmp_path / "scan.jsonl")
    write_jsonl_scan(spark, result.routed, out, counters.asDict())
    lines = [
        json.loads(ln)
        for part in sorted(Path(out).glob("part-*"))
        for ln in part.read_text().splitlines()
    ]
    for ev in lines:
        assert "context" not in ev  # serde skip_serializing_if analog
