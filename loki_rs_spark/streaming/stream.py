"""Structured Streaming rendering of the scan pipeline.

The reference is a batch scanner with explicit scan_start/scan_end
bracketing (src/helpers/unified_logger.rs:706-735) — no streaming exists to
port. But the pipeline itself is stateless per row (filters, hashes,
broadcast joins, matcher UDF, score fold), so the SAME plan runs unchanged
as a stream: `readStream` on a transcript directory -> scan_transcripts ->
`writeStream` partitioned by severity with checkpointing. This is the
Spark-idiomatic form of "new turns keep arriving and matches keep routing";
exactly-once sink semantics come from the checkpoint + file-sink commit
log, complementing the batch path's explicit lineage table
(plans/resume.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import DEFAULT_CONFIG, ScanConfig
from ..plans.pipeline import scan_transcripts
from ..signatures.model import SignatureSet


def routed_stream(
    spark: SparkSession,
    input_dir: str,
    schema_source: DataFrame,
    sigs: SignatureSet,
    cfg: ScanConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Build the streaming routed-rows DataFrame from a parquet directory
    of transcript files (schema taken from `schema_source`)."""
    stream = (
        spark.readStream.schema(schema_source.schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    result = scan_transcripts(spark, stream, sigs, cfg)
    return result.routed.drop("all_reasons")


def run_stream_once(
    spark: SparkSession,
    input_dir: str,
    schema_source: DataFrame,
    sigs: SignatureSet,
    out_dir: str,
    cfg: ScanConfig = DEFAULT_CONFIG,
    timeout_sec: int = 300,
) -> None:
    """Drain everything currently in `input_dir` (Trigger.AvailableNow) into
    a severity-partitioned parquet sink with checkpointing, then stop.
    Re-running after new files arrive processes ONLY the new files — the
    streaming analog of the batch lineage resume."""
    routed = routed_stream(spark, input_dir, schema_source, sigs, cfg)
    query = (
        routed.writeStream.format("parquet")
        .option("path", f"{out_dir}/routed")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .partitionBy("level")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
