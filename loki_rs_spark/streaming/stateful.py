"""Custom stateful streaming operator: per-conversation running alert
totals via ``applyInPandasWithState``.

The reference has no streaming state at all (SURVEY.md §2.9); this is the
Spark-native answer to "keep a per-conversation tally as turns keep
arriving": state lives in the state store, survives restarts through the
checkpoint, and each micro-batch emits the updated totals for the
conversations it touched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..config import DEFAULT_CONFIG, ScanConfig
from ..plans.pipeline import scan_transcripts
from ..signatures.model import SignatureSet

OUTPUT_SCHEMA = (
    "conv_id string, total_matches long, total_alerts long, max_score int"
)
STATE_SCHEMA = "total_matches long, total_alerts long, max_score int"


def _update_conv_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    total_matches, total_alerts, max_score = (
        state.get if state.exists else (0, 0, 0)
    )
    for pdf in pdfs:
        total_matches += len(pdf)
        total_alerts += int((pdf["level"] == "ALERT").sum())
        if len(pdf):
            max_score = max(max_score, int(pdf["score"].max()))
    state.update((total_matches, total_alerts, max_score))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "total_matches": [total_matches],
            "total_alerts": [total_alerts],
            "max_score": [max_score],
        }
    )


def run_stateful_totals(
    spark: SparkSession,
    input_dir: str,
    schema_source: DataFrame,
    sigs: SignatureSet,
    out_dir: str,
    cfg: ScanConfig = DEFAULT_CONFIG,
    timeout_sec: int = 300,
) -> None:
    """Drain available files, updating per-conversation totals in the state
    store; append each batch's updated totals to `{out}/conv_totals`.
    Re-running after new files arrive RESUMES the state (checkpointed)."""
    stream = (
        spark.readStream.schema(schema_source.schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    routed = scan_transcripts(spark, stream, sigs, cfg).routed
    totals = (
        routed.select("conv_id", "level", "score")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conv_state,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        # update-mode rows land in an append-only parquet log; readers take
        # the max per conv_id (totals are monotone)
        batch_df.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(f"{out_dir}/conv_totals")

    from pyspark.sql import functions as F

    query = (
        totals.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", f"{out_dir}/_state_checkpoint")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
