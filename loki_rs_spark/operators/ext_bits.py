"""JVM-side external-variable evaluation, packed into one int64 column.

The matcher UDF needs the truth of every external-variable predicate
(filename/filepath/extension/filetype/owner conditions — reference globals
set per row at src/modules/filesystem_scan.rs:1017-1032). Those predicates
are pure functions of (tool, role), so instead of shipping the strings
across the Python bridge and re-deriving extension/filetype there, the
pipeline evaluates each distinct atom as a whole-stage-codegen'd Catalyst
boolean and packs them into ONE bigint (`ext_bits`): 8 bytes per row on
the bridge, zero Python string work. Bit i corresponds to
`conditions.collect_ext_atoms(sigs)[i]` — the shared contract with the
matcher's ExtBits reader.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..signatures.conditions import (
    EXTENSION_REGEX,
    TOOL_TYPE_DEFAULT,
    TOOL_TYPE_RULES,
    ExtPred,
    collect_ext_atoms,
)
from ..signatures.model import SignatureSet


def catalyst_ext_var(var: str) -> Column:
    """Turn-table rendering of the reference's scan globals (mapping
    documented in signatures/conditions.py)."""
    # NULL tool/role coalesce to '' so negative predicates ('ne', 'not
    # filename == ...') fire exactly as the row backend's str semantics
    # do — under three-valued logic a NULL column would make the predicate
    # NULL -> bit 0 -> silently not fired.
    if var in ("filename", "filepath"):
        return F.coalesce(F.col("tool"), F.lit(""))
    if var == "owner":
        return F.coalesce(F.col("role"), F.lit(""))
    if var == "extension":
        return F.regexp_extract(
            F.coalesce(F.col("tool"), F.lit("")), EXTENSION_REGEX, 1
        )
    if var == "filetype":
        out = None
        for op, arg, label in TOOL_TYPE_RULES:
            cond = (
                F.col("tool").endswith(arg)
                if op == "endswith"
                else F.col("tool").startswith(arg)
            )
            out = (
                F.when(cond, F.lit(label))
                if out is None
                else out.when(cond, F.lit(label))
            )
        return out.otherwise(F.lit(TOOL_TYPE_DEFAULT))
    raise ValueError(f"unknown external var {var}")  # pragma: no cover


def catalyst_ext_pred(p: ExtPred) -> Column:
    # Fast path: `extension == "exe"` is exactly `tool endswith ".exe"`
    # whenever the literal is non-empty and separator-free (the extension
    # regex takes everything after the LAST dot provided no ./\ follows,
    # so an endswith probe on ".<v>" accepts and rejects the same tools).
    # This keeps the per-row ext_bits projection regex-free: measured
    # ~2s/4M rows saved vs regexp_extract in the UDF input projection.
    if (
        p.var == "extension"
        and p.op in ("eq", "ne")
        and p.value
        and not any(c in "./\\" for c in p.value)
    ):
        probe = F.coalesce(F.col("tool"), F.lit("")).endswith("." + p.value)
        return probe if p.op == "eq" else ~probe
    col, v = catalyst_ext_var(p.var), p.value
    if p.op == "eq":
        return col == F.lit(v)
    if p.op == "ne":
        return col != F.lit(v)
    if p.op == "iequals":
        return F.lower(col) == F.lit(v.lower())
    if p.op == "contains":
        return F.contains(col, F.lit(v))
    if p.op == "icontains":
        return F.contains(F.lower(col), F.lit(v.lower()))
    if p.op == "startswith":
        return col.startswith(v)
    if p.op == "istartswith":
        return F.lower(col).startswith(v.lower())
    if p.op == "endswith":
        return col.endswith(v)
    if p.op == "iendswith":
        return F.lower(col).endswith(v.lower())
    if p.op == "matches":
        return col.rlike(p.value)
    raise ValueError(f"unknown ext op {p.op}")  # pragma: no cover


def ext_bits_col(sigs: SignatureSet) -> Column:
    """The packed atom bitmask for this signature set (constant 0 when no
    rule uses external variables — Catalyst folds it away)."""
    atoms = collect_ext_atoms(sigs)
    bits: Column = F.lit(0).cast("long")
    for i, atom in enumerate(atoms):
        bits = bits.bitwiseOR(
            F.when(catalyst_ext_pred(atom), F.lit(1 << i))
            .otherwise(F.lit(0))
            .cast("long")
        )
    return bits
