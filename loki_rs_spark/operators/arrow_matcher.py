"""Arrow-native multi-pattern matcher — the scale path for P5/J3.

The pandas-UDF matcher (matcher.py) converts every row's text into a
Python string object before matching; at tens of millions of rows per
executor that object churn dominates and kills scaling. This variant stays
in Arrow end to end:

* `df.mapInArrow` streams RecordBatches straight from the JVM;
* per signature string, ONE `pyarrow.compute.match_substring[_regex]`
  kernel call over the whole batch (C++-vectorized RE2 / literal scan,
  zero Python objects in the hot path);
* per-rule condition algebra on numpy boolean masks;
* Python-level work (matched-string offsets, struct building) happens only
  for the sparse hit rows, and the output list<struct> arrays are built
  from offsets + flat values (no per-row Python lists for misses).

Pattern-dialect note: the batch kernels use RE2, the per-hit offset
extraction uses Python `re`. The supported signature subset (literal
strings + RE2-compatible regexes, no backreferences/lookaround) behaves
identically under both; parity with the reference scanner is enforced by
tests/test_pipeline.py.

Mirrors the reference's compile-once automaton sharing (src/main.rs:780-851)
via the same per-executor `_engine_for` cache as the pandas path.
"""

from typing import Iterator, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession

from ..signatures.model import SignatureSet
from .matcher import MAX_YARA_MATCHES, _engine_for, format_matched_data

FNAME_STRUCT = pa.struct(
    [
        pa.field("pattern", pa.string()),
        pa.field("score", pa.int32()),
        pa.field("description", pa.string()),
    ]
)
YARA_STRUCT = pa.struct(
    [
        pa.field("rule", pa.string()),
        pa.field("score", pa.int32()),
        pa.field("description", pa.string()),
        pa.field("author", pa.string()),
        pa.field("reference", pa.string()),
        pa.field("matched_strings", pa.list_(pa.string())),
    ]
)

MATCH_COLS_DDL = (
    "_m_fname array<struct<pattern:string,score:int,description:string>>, "
    "_m_yara array<struct<rule:string,score:int,description:string,"
    "author:string,reference:string,matched_strings:array<string>>>"
)


def _mask(arr, pattern: str, *, regex: bool, ignore_case: bool = False) -> np.ndarray:
    if regex:
        m = pc.match_substring_regex(arr, pattern, ignore_case=ignore_case)
    else:
        m = pc.match_substring(arr, pattern, ignore_case=ignore_case)
    return m.to_numpy(zero_copy_only=False).astype(bool)


def _list_struct_array(
    struct_type: pa.StructType, counts: np.ndarray, rows: dict[int, list[dict]]
) -> pa.Array:
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat: list[dict] = []
    for i in sorted(rows):
        flat.extend(rows[i])
    values = pa.array(flat, type=struct_type)
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), values
    )


def match_record_batch(engine, batch: pa.RecordBatch) -> tuple[pa.Array, pa.Array]:
    """Match one RecordBatch; returns (_m_fname, _m_yara) list arrays."""
    text = batch.column("text")
    tool = batch.column("tool")
    n = batch.num_rows

    # ---- filename IOCs (J3)
    fn_counts = np.zeros(n, dtype=np.int64)
    fn_rows: dict[int, list[dict]] = {}
    for _rx, _fp_rx, ioc in engine.fname:
        mask = _mask(tool, ioc.pattern, regex=True)
        if ioc.fp_pattern:
            mask &= ~_mask(tool, ioc.fp_pattern, regex=True)
        for idx in np.nonzero(mask)[0]:
            i = int(idx)
            fn_rows.setdefault(i, []).append(
                {
                    "pattern": ioc.pattern,
                    "score": ioc.score,
                    "description": ioc.description,
                }
            )
            fn_counts[i] += 1
    fname_arr = _list_struct_array(FNAME_STRUCT, fn_counts, fn_rows)

    # ---- YARA subset (P5)
    ya_counts = np.zeros(n, dtype=np.int64)
    ya_rows: dict[int, list[dict]] = {}
    text_cache: dict[int, str] = {}
    for compiled in engine.yara:
        masks = [
            _mask(text, s.pattern, regex=s.is_regex, ignore_case=s.nocase)
            for s in compiled.rule.strings
        ]
        fired = np.zeros(n, dtype=np.int32)
        for m in masks:
            fired += m
        for idx in np.nonzero(fired >= compiled.needed)[0]:
            i = int(idx)
            if ya_counts[i] >= MAX_YARA_MATCHES:
                continue
            row_text = text_cache.get(i)
            if row_text is None:
                row_text = text[i].as_py()
                text_cache[i] = row_text
            matched_strings: list[str] = []
            for (identifier, rx), mask in zip(compiled.patterns, masks):
                if not mask[i]:
                    continue
                for m in rx.finditer(row_text):
                    matched_strings.append(
                        f"{identifier}: {format_matched_data(m.group(0))}"
                        f" @ {m.start()}"
                    )
            rule = compiled.rule
            ya_rows.setdefault(i, []).append(
                {
                    "rule": rule.name,
                    "score": rule.score,
                    "description": rule.description,
                    "author": rule.author,
                    "reference": rule.reference,
                    "matched_strings": matched_strings,
                }
            )
            ya_counts[i] += 1
    yara_arr = _list_struct_array(YARA_STRUCT, ya_counts, ya_rows)

    return fname_arr, yara_arr


def _java_escape_literal(lit: str) -> str:
    """Escape a literal for Java regex (Python re.escape emits only
    punctuation escapes, which Java accepts)."""
    import re as _re

    return _re.escape(lit)


def match_gate_exprs(sigs: SignatureSet):
    """Cheap JVM-side candidate gates for the UDF matcher: a single
    alternation regex over `text` (all YARA string literals/regexes) and one
    over `tool` (all filename-IOC patterns). A row that fails both gates
    cannot match any signature, so the pipeline blanks its strings before
    the Arrow UDF — the Python bridge then carries only candidate bytes.

    This is the Spark rendering of the reference's cheap-predicates-before-
    expensive-scan ordering (src/modules/filesystem_scan.rs:590-708), and
    is REQUIRED at scale: Catalyst cannot push selectivity through an
    opaque UDF, so we stage it ourselves. Returns (text_gate, tool_gate)
    Column predicates, each a superset of the real match condition."""
    from pyspark.sql import functions as F

    # Literal strings gate via contains() (JVM indexOf — much cheaper than
    # a backtracking regex alternation over long text); regex strings and
    # the (short) tool patterns use rlike.
    text_conds: list = []
    text_alts: list[str] = []
    for rule in sigs.yara_rules:
        for s in rule.strings:
            if s.is_regex:
                body = f"(?i:{s.pattern})" if s.nocase else f"(?:{s.pattern})"
                text_alts.append(body)
            elif s.nocase:
                text_conds.append(
                    F.contains(F.lower(F.col("text")), F.lit(s.pattern.lower()))
                )
            else:
                text_conds.append(F.contains(F.col("text"), F.lit(s.pattern)))
    if text_alts:
        text_conds.append(F.col("text").rlike("|".join(text_alts)))
    tool_alts = [f"(?:{ioc.pattern})" for ioc in sigs.filename_iocs]

    text_gate = F.lit(False)
    for cond in text_conds:
        text_gate = text_gate | cond
    tool_gate = (
        F.col("tool").rlike("|".join(tool_alts)) if tool_alts else F.lit(False)
    )
    return text_gate, tool_gate


def make_arrow_matcher_udf(spark: SparkSession, sigs: SignatureSet):
    """Scalar Arrow UDF (Spark 4.1 `arrow_udf`, iterator form): ONLY the
    text and tool columns cross the Python bridge (unlike mapInArrow,
    which round-trips every column), and the match computation runs on
    Arrow buffers via pyarrow compute kernels. This is the production
    matcher."""
    from pyspark.sql.functions import arrow_udf

    bc = spark.sparkContext.broadcast(sigs.to_payload())
    return_ddl = (
        "struct<fname:array<struct<pattern:string,score:int,"
        "description:string>>,"
        "yara:array<struct<rule:string,score:int,description:string,"
        "author:string,reference:string,matched_strings:array<string>>>>"
    )

    @arrow_udf(return_ddl)
    def match_signatures_arrow(
        it: Iterator[Tuple[pa.Array, pa.Array]],
    ) -> Iterator[pa.Array]:
        engine = _engine_for(bc.value)
        for text, tool in it:
            batch = pa.RecordBatch.from_arrays(
                [_as_array(text), _as_array(tool)], names=["text", "tool"]
            )
            fname_arr, yara_arr = match_record_batch(engine, batch)
            yield pa.StructArray.from_arrays(
                [fname_arr, yara_arr], names=["fname", "yara"]
            )

    return match_signatures_arrow


def _as_array(arr):
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def with_matches_arrow(
    spark: SparkSession, df: DataFrame, sigs: SignatureSet
) -> DataFrame:
    """Append `_m_fname` / `_m_yara` match columns via mapInArrow, passing
    every input column through untouched. (Kept for comparison; the
    arrow_udf path above ships less data across the bridge and is the
    pipeline default.)"""
    bc = spark.sparkContext.broadcast(sigs.to_payload())
    out_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [MATCH_COLS_DDL]
    )

    def gen(batches):
        engine = _engine_for(bc.value)
        for batch in batches:
            fname_arr, yara_arr = match_record_batch(engine, batch)
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [fname_arr, yara_arr],
                names=[*batch.schema.names, "_m_fname", "_m_yara"],
            )

    return df.mapInArrow(gen, out_ddl)
