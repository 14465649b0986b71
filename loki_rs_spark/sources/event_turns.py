"""Second scan source (U1 module union, SURVEY.md §2.7).

The reference unions ProcessCheck and FileScan results into one stream
(src/main.rs:1410-1508). The transcript analog: the `events` stream table
re-shaped into the turn schema and pushed through the SAME scan pipeline,
then unioned with the transcript matches. Trigger rows are planted by
event_id residues exactly like the transcript spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TEXT_RULES: tuple[tuple[int, int, str], ...] = (
    (53, 7, " fired netcat -e /bin/sh probe"),
    (53, 29, " beacon evil-c2.example.com ping"),
)
# whole-text replacements (constant text => known constant hashes). The
# ALPHA payload's md5 AND sha256 are both in hash-iocs.txt: on the process
# path only the md5 (first-of-three) may produce a reason
# (src/modules/process_check.rs:367-397).
EVENT_REPLACE_RULES: tuple[tuple[int, int, str], ...] = (
    (61, 11, "EICAR-TEST-PAYLOAD-ALPHA"),
)
EVENT_TOOL_RULES: tuple[tuple[int, int, str], ...] = (
    (59, 13, "evt/mimikatz.exe"),
)


def load_event_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    text = F.concat(F.col("event_type"), F.lit(" "), F.col("props"))
    for mod, res, suffix in reversed(EVENT_TEXT_RULES):
        text = F.when(
            F.col("event_id") % mod == res,
            F.concat(F.col("event_type"), F.lit(" "), F.col("props"),
                     F.lit(suffix)),
        ).otherwise(text)
    for mod, res, payload in reversed(EVENT_REPLACE_RULES):
        text = F.when(
            F.col("event_id") % mod == res, F.lit(payload)
        ).otherwise(text)
    tool = F.concat(F.lit("events/"), F.col("event_type"))
    for mod, res, value in reversed(EVENT_TOOL_RULES):
        tool = F.when(F.col("event_id") % mod == res, F.lit(value)).otherwise(
            tool
        )
    return events.select(
        F.concat(F.lit("evt-"), F.col("user_id").cast("string")).alias(
            "conv_id"
        ),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.lit("event").alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.col("ts"),
        F.col("event_id").alias("uid"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def event_turns_duckdb_cte() -> str:
    """DuckDB CTE named `event_turns` with the identical derivation."""
    text_whens = [
        f"WHEN event_id % {mod} = {res} THEN {_sql_quote(payload)}"
        for mod, res, payload in EVENT_REPLACE_RULES
    ] + [
        f"WHEN event_id % {mod} = {res} THEN event_type || ' ' || props"
        f" || {_sql_quote(suffix)}"
        for mod, res, suffix in EVENT_TEXT_RULES
    ]
    tool_whens = [
        f"WHEN event_id % {mod} = {res} THEN {_sql_quote(value)}"
        for mod, res, value in EVENT_TOOL_RULES
    ]
    return f"""
event_turns AS (
  SELECT
    'evt-' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(event_id AS INTEGER) AS turn_idx,
    'event' AS role,
    CASE {' '.join(text_whens)} ELSE event_type || ' ' || props END AS text,
    CASE {' '.join(tool_whens)} ELSE 'events/' || event_type END AS tool,
    ts,
    event_id AS uid
  FROM events
)
""".strip()
