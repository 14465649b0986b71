"""Table-format selection (sources/table_format.py): the parquet default
end-to-end, loud rejection of unknown formats, and the Iceberg branch —
exercised for real when an iceberg-spark-runtime jar is on the
classpath, skipped (with the reason recorded) in this sandbox, which
ships none."""

from __future__ import annotations

import pytest

from loki_rs_spark.sources.table_format import (
    _iceberg_table_name,
    iceberg_available,
    read_table,
    write_partitioned,
)


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "ALERT", 1), ("b", "NOTICE", 2)], "id string, level string, v int"
    )
    path = str(tmp_path / "out" / "routed")
    write_partitioned(df, path, ("level",))
    back = read_table(spark, path)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        ("a", 1), ("b", 2),
    ]
    # partition dirs exist (the per-severity fan-out contract)
    assert (tmp_path / "out" / "routed" / "level=ALERT").exists()


def test_append_mode(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "v int")
    path = str(tmp_path / "lineage")
    write_partitioned(df, path, (), mode="append")
    write_partitioned(df, path, (), mode="append")
    assert read_table(spark, path).count() == 2


def test_unknown_format_raises(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="unknown table format"):
        write_partitioned(df, str(tmp_path / "x"), (), fmt="orcberg")


def test_table_name_derivation():
    assert _iceberg_table_name("/scans/run7/routed") == "local.run7_routed"


def test_iceberg_roundtrip_or_documented_skip(spark, tmp_path):
    """The real Iceberg write path. In environments with the runtime jar
    (spark.jars.packages org.apache.iceberg:iceberg-spark-runtime-*) plus
    a configured catalog this runs createOrReplace/overwritePartitions
    round-trips; here it records exactly why it cannot."""
    if not iceberg_available(spark):
        pytest.skip(
            "no iceberg-spark-runtime jar on the classpath (sandbox has "
            "no network to fetch one); branch code is exercised only for "
            "format dispatch"
        )
    df = spark.createDataFrame(
        [("a", "ALERT", 1)], "id string, level string, v int"
    )
    write_partitioned(
        df, str(tmp_path / "t"), ("level",), fmt="iceberg",
        table="local.tf_test",
    )
    back = read_table(spark, str(tmp_path / "t"), fmt="iceberg",
                      table="local.tf_test")
    assert back.count() == 1
