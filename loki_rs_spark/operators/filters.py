"""Row-pruning filters (SURVEY.md §2.2, F1-F8).

The reference applies cheap conjunctive predicates per row before the
expensive scan (src/modules/filesystem_scan.rs:559-708). In Spark these are
plain `filter` expressions that Catalyst pushes toward the scan; the
OR-folded exclusion alternation keeps it ONE regex evaluation per row
regardless of how many exclusion patterns are configured.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exclusion_pattern(patterns: Iterable[str]) -> str | None:
    pats = [p for p in patterns if p]
    if not pats:
        return None
    return "|".join(f"(?:{p})" for p in pats)


def apply_exclusions(df: DataFrame, patterns: Iterable[str]) -> DataFrame:
    """Config exclusions (F3, src/modules/filesystem_scan.rs:607-613).
    The reference tests each regex against the full path; `tool` is the
    path analog of a transcript turn."""
    combined = exclusion_pattern(patterns)
    if combined is None:
        return df
    return df.filter(~F.col("tool").rlike(combined))


def apply_size_filter(df: DataFrame, max_text_chars: int) -> DataFrame:
    """Size cap (F7): the reference drops files larger than
    --max-file-size (64 MB default, src/modules/filesystem_scan.rs:672-685);
    for turns the scanned content is `text`. NULL text (a corrupt record)
    survives the filter: the reference counts unreadable inputs as errors
    (tests/error_handling_tests/) rather than silently dropping them —
    scan_counters reports them via its `errors` column and they match
    nothing downstream."""
    return df.filter(
        F.col("text").isNull() | (F.length(F.col("text")) <= max_text_chars)
    )
