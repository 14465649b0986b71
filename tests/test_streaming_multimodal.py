"""Structured Streaming scan + multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest

from loki_rs_spark.config import ScanConfig
from loki_rs_spark.operators.multimodal import (
    decode_image_stub,
    extract_features,
    synthetic_media,
)
from loki_rs_spark.plans.pipeline import scan_transcripts
from loki_rs_spark.sources.transcripts import load_transcripts
from loki_rs_spark.streaming.stream import run_stream_once

from .conftest import SF_SMALL

CFG = ScanConfig()


def test_stream_matches_batch(spark, sigs, tmp_path):
    transcripts = load_transcripts(spark, SF_SMALL, rep=2)
    in_dir = str(tmp_path / "turns")
    out_dir = str(tmp_path / "out")
    transcripts.write.parquet(in_dir)

    run_stream_once(spark, in_dir, transcripts, sigs, out_dir, CFG)

    batch_result = scan_transcripts(spark, transcripts, sigs, CFG)
    expected = {
        (r["conv_id"], r["turn_idx"], r["level"], r["score"])
        for r in batch_result.routed.collect()
    }
    streamed = {
        (r["conv_id"], r["turn_idx"], r["level"], r["score"])
        for r in spark.read.parquet(f"{out_dir}/routed").collect()
    }
    assert streamed == expected
    assert len(streamed) > 0

    # incremental semantics: re-running with no new files adds nothing
    run_stream_once(spark, in_dir, transcripts, sigs, out_dir, CFG)
    rerun = spark.read.parquet(f"{out_dir}/routed").count()
    assert rerun == len(expected)


def test_decode_stub_gating():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"abc")
    v1 = decode_image_stub(b"abc", deterministic_fake=True)
    v2 = decode_image_stub(b"abc", deterministic_fake=True)
    assert (v1 == v2).all()
    assert len(v1) == 8
    assert abs(float((v1**2).sum()) - 1.0) < 1e-5


def test_multimodal_feature_extraction(spark):
    media = synthetic_media(spark, SF_SMALL, limit=32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["kind"] == "image" and by_id[1]["kind"] == "audio"
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
    # deterministic across plans
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in feats)


def test_stateful_conv_totals_resume(spark, sigs, tmp_path):
    """applyInPandasWithState totals accumulate across TWO separate
    AvailableNow runs (state restored from checkpoint)."""
    from pyspark.sql import functions as F

    from loki_rs_spark.streaming.stateful import run_stateful_totals

    transcripts = load_transcripts(spark, SF_SMALL, rep=2).cache()
    half_a = transcripts.filter(F.col("uid") % 2 == 0)
    half_b = transcripts.filter(F.col("uid") % 2 == 1)
    in_dir = str(tmp_path / "turns")
    out_dir = str(tmp_path / "state_out")

    half_a.write.mode("overwrite").parquet(in_dir)
    run_stateful_totals(spark, in_dir, transcripts, sigs, out_dir, CFG)
    half_b.write.mode("append").parquet(in_dir)
    run_stateful_totals(spark, in_dir, transcripts, sigs, out_dir, CFG)

    # latest emitted total per conversation == batch-mode totals
    totals = spark.read.parquet(f"{out_dir}/conv_totals")
    latest = {
        r["conv_id"]: (r["total_matches"], r["total_alerts"], r["max_score"])
        for r in totals.groupBy("conv_id")
        .agg(
            F.max("total_matches").alias("total_matches"),
            F.max("total_alerts").alias("total_alerts"),
            F.max("max_score").alias("max_score"),
        )
        .collect()
    }
    batch = scan_transcripts(spark, transcripts, sigs, CFG).routed
    expected = {
        r["conv_id"]: (r["n"], r["a"], r["m"])
        for r in batch.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("level") == "ALERT", 1)).alias("a"),
            F.max("score").alias("m"),
        )
        .collect()
    }
    assert latest == expected and len(latest) > 0
