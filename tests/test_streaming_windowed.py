"""Watermark + tumbling-window streaming semantics (§2.9): windows emit
exactly once when the watermark passes, in-lateness events aggregate,
beyond-lateness events drop, and the checkpoint resumes watermark state
across restarts."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from loki_rs_spark.streaming.windowed import run_hourly_stream_once

SCHEMA = (
    "event_id long, user_id string, event_type string, "
    "value double, ts timestamp"
)


def _events(spark, rows):
    df = spark.createDataFrame(
        [(i, "u1", etype, val, ts) for i, (etype, val, ts) in enumerate(rows)],
        "event_id long, user_id string, event_type string, value double, "
        "ts string",
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _read_hourly(spark, out_dir):
    try:
        return {
            (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.read.parquet(f"{out_dir}/hourly").collect()
        }
    except Exception:
        return {}


def test_watermarked_hourly_windows(spark, tmp_path):
    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    in_dir.mkdir()
    schema_source = _events(spark, [("click", 1.0, "2026-01-01 10:00:00")])

    # file 1: two events in the 10:00 window, one event-time straggler
    # at 12:30 that pushes the watermark (delay 30m) to 12:00
    _events(
        spark,
        [
            ("click", 1.5, "2026-01-01 10:05:00"),
            ("click", 2.0, "2026-01-01 10:45:00"),
            ("view", 3.0, "2026-01-01 12:30:00"),
        ],
    ).coalesce(1).write.mode("overwrite").parquet(str(in_dir / "f1"))
    run_hourly_stream_once(spark, f"{in_dir}/f1", schema_source, out_dir)

    # file 2 (same checkpoint, new drain): a LATE event for the already-
    # closed 10:00 window (must be dropped), an in-lateness event for the
    # open 12:00 window, and a 14:30 event pushing the watermark to 14:00
    # so the 12:00 window finalizes
    in2 = tmp_path / "in2"
    _events(
        spark,
        [
            ("click", 99.0, "2026-01-01 10:30:00"),  # beyond lateness: DROP
            ("view", 4.0, "2026-01-01 12:40:00"),  # open window: counts
            ("view", 5.0, "2026-01-01 14:30:00"),  # advances watermark
        ],
    ).coalesce(1).write.mode("overwrite").parquet(str(in2))
    # widen the glob: move f2 into the watched dir
    (in_dir / "f1").mkdir(exist_ok=True)
    for part in Path(in2).glob("part-*"):
        part.rename(in_dir / "f1" / part.name)
    run_hourly_stream_once(spark, f"{in_dir}/f1", schema_source, out_dir)

    got = _read_hourly(spark, out_dir)
    # 10:00 window finalized after drain 1's watermark advance, WITHOUT
    # the late 99.0 event
    assert got[("2026-01-01 10:00:00", "click")] == (2, 3.5)
    # 12:00 window finalized in drain 2 WITH the in-lateness 12:40 event
    assert got[("2026-01-01 12:00:00", "view")] == (2, 7.0)
    # 14:00 window still open (watermark 14:00 == window start)
    assert ("2026-01-01 14:00:00", "view") not in got
