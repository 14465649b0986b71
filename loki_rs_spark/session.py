"""SparkSession factory with the scale-oriented defaults this pipeline
assumes: AQE on (runtime re-plan + skew-join), Arrow for the pandas UDF
matcher stage, UTC session time zone for reproducible timestamps."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "loki-rs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 20k rows/batch (guide §4.2: raise for narrow data): the matcher
        # ships 3 narrow columns, so bigger batches amortize per-batch
        # dispatch + dict-encode overhead — measured ~5% on the 32-core
        # scan leg, neutral on 2/8 cores, ~10-20 MB/batch/worker at this
        # corpus's text sizes (vs 40k: +0.5% for 2x the memory; env-
        # overridable for wide-row corpora).
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "20000"),
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or (int(cpus) if cpus.isdigit() else 32)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    return builder.getOrCreate()
