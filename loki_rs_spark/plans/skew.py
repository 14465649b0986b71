"""Explicit skew handling (north_rule: salted-key repartitioning against
conversation-length skew).

The derived transcript table has conversations whose length grows linearly
with the conversation index (sources/transcripts.py), so a naive
`groupBy(conv_id)` or `repartition(conv_id)` would hand the largest
conversations to single tasks. Two tools:

* `salted_repartition` — spread each conversation over `salt_buckets`
  partitions via a deterministic turn-derived salt (no RNG: Spark re-runs
  tasks, so salts must be stable under retry);
* `per_conv_rollup_salted` — the classic two-stage aggregation: partial
  aggregate on (conv_id, salt), then final aggregate on conv_id. The
  shuffle for stage 1 is uniform even when one conversation dominates.

Note Spark's map-side partial aggregation already de-skews *algebraic*
aggregations; the explicit salted form is shown (and tested equal) because
the north rule demands explicit skew handling and because it also covers
non-algebraic aggregates (e.g. collect_list of turns per conversation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int = 16) -> DataFrame:
    return df.withColumn(
        "salt", F.pmod(F.col("turn_idx"), F.lit(salt_buckets))
    )


def salted_repartition(
    df: DataFrame, num_partitions: int, salt_buckets: int = 16
) -> DataFrame:
    return (
        with_salt(df, salt_buckets)
        .repartition(num_partitions, F.col("conv_id"), F.col("salt"))
        .drop("salt")
    )


def per_conv_rollup(routed_or_evaluated: DataFrame) -> DataFrame:
    """Direct per-conversation rollup (baseline for the salted variant)."""
    return routed_or_evaluated.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count(F.when(F.col("level").isNotNull(), 1)).alias("n_routed"),
        F.count(F.when(F.col("level") == "ALERT", 1)).alias("n_alerts"),
        F.max("score").alias("max_score"),
    )


def per_conv_rollup_salted(
    evaluated: DataFrame, salt_buckets: int = 16
) -> DataFrame:
    """Two-stage salted rollup, result-identical to `per_conv_rollup`."""
    partial = (
        with_salt(evaluated, salt_buckets)
        .groupBy("conv_id", "salt")
        .agg(
            F.count("*").alias("p_turns"),
            F.count(F.when(F.col("level").isNotNull(), 1)).alias("p_routed"),
            F.count(F.when(F.col("level") == "ALERT", 1)).alias("p_alerts"),
            F.max("score").alias("p_max"),
        )
    )
    return partial.groupBy("conv_id").agg(
        F.sum("p_turns").alias("n_turns"),
        F.sum("p_routed").alias("n_routed"),
        F.sum("p_alerts").alias("n_alerts"),
        F.max("p_max").alias("max_score"),
    )
