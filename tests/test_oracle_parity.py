"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
and compare row multisets (columns sorted by name, order-insensitive)."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from .conftest import SF_SMALL

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "item"):  # numpy scalars from duckdb
        return _norm(v.item())
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.collect()
    ), cols


def _duck_rows(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = sorted(
        tuple(_norm(row[i]) for i in order) for row in cur.fetchall()
    )
    return rows, sorted(names)


def _query_names():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle keys must be a subset of queries"
    return sorted(o)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF_SMALL)
    spark_rows, spark_cols = _spark_rows(df)
    duck_rows, duck_cols = _duck_rows(entrymod.oracle_sql()[name])

    assert spark_cols == duck_cols, f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ ({len(spark_rows)} vs {len(duck_rows)})"
    )
    mismatches = [
        (s, d) for s, d in zip(spark_rows, duck_rows) if s != d
    ]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert "level" in df.columns
