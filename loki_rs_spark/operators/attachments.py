"""Nested-payload explode — the true S3 archive-source analog.

The reference scans archive members as CHILD rows: each ZIP entry is read,
its display path becomes ``parent -> entry``, and the child content runs
through the same match pipeline as a first-class file
(src/modules/filesystem_scan.rs:744-785). The transcript analog: a turn's
``text`` may embed sub-documents as fenced attachments

    <<attach:NAME>>PAYLOAD<<end>>

`explode_attachments` extracts every attachment into a child turn that

* keeps the parent's (conv_id, turn_idx, role, ts, uid) identity,
* sets ``tool = parent_tool || '->' || NAME`` (the reference's
  parent->entry display-path concatenation),
* sets ``text = PAYLOAD`` (the scanned content),
* carries ``parent_md5`` (the parent content hash, the analog of the
  archive row's own hashes traveling with its entries).

Child rows route through scan_transcripts unchanged — same filters, same
matchers, same scoring — exactly as the reference scans archive members
with the shared rule set. Everything is Catalyst expressions
(regexp_extract_all + arrays_zip + explode): no UDF, no shuffle; at 100 TB
the explode is map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Lazy payload group: RE2- and Java-regex-compatible (no lookaround), so
# the Spark plan and the DuckDB oracle compile the same pattern.
ATTACH_PATTERN = r"<<attach:([^>]+)>>(.*?)<<end>>"


def explode_attachments(df: DataFrame) -> DataFrame:
    """One child row per fenced attachment; parents without attachments
    produce no rows (explode of an empty zip)."""
    names = F.regexp_extract_all(F.col("text"), F.lit(ATTACH_PATTERN), 1)
    payloads = F.regexp_extract_all(F.col("text"), F.lit(ATTACH_PATTERN), 2)
    zipped = F.arrays_zip(names.alias("name"), payloads.alias("payload"))
    base_cols = [c for c in df.columns if c not in ("text", "tool")]
    return (
        df.withColumn("att", F.explode(zipped))
        .select(
            *base_cols,
            F.concat(F.col("tool"), F.lit("->"), F.col("att.name")).alias(
                "tool"
            ),
            F.col("att.payload").alias("text"),
            F.md5(F.col("text").cast("binary")).alias("parent_md5"),
        )
    )
