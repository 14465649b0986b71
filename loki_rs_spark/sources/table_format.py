"""Output table-format selection (north rule: Iceberg sinks).

The sandbox ships no ``iceberg-spark-runtime`` jar (verified: neither the
pyspark jars dir nor the filesystem has one, and there is no network to
fetch it), so the default format is partitioned parquet with dynamic
partition overwrite. The Iceberg branch below is the real code path a
deployment flips on with ``SPARK_GRAFT_TABLE_FORMAT=iceberg`` (or the
``fmt=`` argument) once the runtime jar + catalog are on the classpath:

* partitioned parquet dir        -> Iceberg table with identity/bucket
                                    partitioning (DataFrameWriterV2)
* pre-clear + dynamic overwrite  -> ``overwritePartitions()`` (an atomic
                                    REPLACE snapshot; no manual pre-clear
                                    needed — Iceberg's snapshot isolation
                                    subsumes resume.py's delete loop)
* append lineage rows            -> ``append()``

tests/test_table_format.py exercises the Iceberg branch and is skipped
automatically when the runtime jar is absent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def default_format() -> str:
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _iceberg_table_name(path: str) -> str:
    """Derive a catalog table identifier from an output path: the last
    two path segments under the configured catalog (out/routed ->
    <catalog>.out.routed). Deployments with real catalogs pass explicit
    `table=` instead."""
    catalog = os.environ.get("SPARK_GRAFT_ICEBERG_CATALOG", "local")
    parts = [p for p in path.replace("\\", "/").split("/") if p]
    return f"{catalog}." + "_".join(parts[-2:])


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    mode: str = "overwrite",
    fmt: str | None = None,
    table: str | None = None,
) -> None:
    """Write a (possibly partitioned) output table in the configured
    format. parquet: plain partitioned directory write. iceberg:
    DataFrameWriterV2 — createOrReplace for 'overwrite',
    overwritePartitions for 'overwrite_partitions' (the resume path's
    idempotent bucket rewrite), append for 'append'."""
    from pyspark.sql import functions as F

    fmt = fmt or default_format()
    if fmt == "parquet":
        writer = df.write.mode(
            "overwrite" if mode == "overwrite_partitions" else mode
        )
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)
        return
    if fmt == "iceberg":
        name = table or _iceberg_table_name(path)
        w = df.writeTo(name).using("iceberg")
        for c in partition_cols:
            w = w.partitionedBy(F.col(c))
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "overwrite_partitions":
            w.overwritePartitions()
        elif mode == "append":
            w.append()
        else:
            raise ValueError(f"unknown write mode {mode!r}")
        return
    raise ValueError(f"unknown table format {fmt!r}")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    table: str | None = None,
) -> DataFrame:
    fmt = fmt or default_format()
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "iceberg":
        return spark.read.table(table or _iceberg_table_name(path))
    raise ValueError(f"unknown table format {fmt!r}")
