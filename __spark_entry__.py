"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship scan (routed matches) on sf0.001.
queries()    — every implemented operator/query from SURVEY.md §2 plus the
               training-data pipeline ops; callables of (spark, sf_dir).
oracle_sql() — independent DuckDB renderings of the same semantics,
               generated in loki_rs_spark/oracle.py from the same parsed
               signature corpus.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full scan pipeline's routed matches at sf0.001."""
    from loki_rs_spark.queries import QUERIES

    return QUERIES["scan_matches"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from loki_rs_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from loki_rs_spark.queries import oracle_queries

    return oracle_queries()
