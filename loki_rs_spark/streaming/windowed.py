"""Watermarked windowed aggregation over the event stream (§2.9).

The batch `events_hourly` rollup re-expressed for unbounded input: a
tumbling 1-hour window per event_type with a watermark bounding how late
an event may arrive. Append output mode emits a window exactly once —
when the watermark passes its end — and events older than the watermark
are DROPPED, which is the documented trade: bounded state (the window
store holds only open windows) in exchange for ignoring stragglers beyond
the allowed lateness. At 10^12-turn scale this is what keeps the state
store finite; the batch path has no such cutoff and is the completeness
backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_counts_stream(
    spark: SparkSession,
    input_dir: str,
    schema_source: DataFrame,
    delay: str = "30 minutes",
) -> DataFrame:
    """Streaming hourly rollup: one row per finalized (window, event_type)
    with count + 2dp value sum — the streaming rendering of
    queries.q_events_hourly."""
    stream = (
        spark.readStream.schema(schema_source.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    return (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_hourly_stream_once(
    spark: SparkSession,
    input_dir: str,
    schema_source: DataFrame,
    out_dir: str,
    delay: str = "30 minutes",
    timeout_sec: int = 300,
) -> None:
    """Drain available files (append mode: only windows the watermark has
    closed are written), checkpointed so a later invocation resumes the
    watermark and window state."""
    agg = hourly_counts_stream(spark, input_dir, schema_source, delay)
    query = (
        agg.writeStream.format("parquet")
        .option("path", f"{out_dir}/hourly")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
