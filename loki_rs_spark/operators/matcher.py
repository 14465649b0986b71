"""The vectorized multi-pattern matcher (P5 + the scale path for J3).

The reference compiles all YARA rules into ONE shared automaton at startup
and reuses it across threads (src/main.rs:780-851, fresh cheap Scanner per
row, src/modules/filesystem_scan.rs:1010-1011). The Spark analog:

* the SignatureSet is pickled once on the driver and broadcast;
* each executor PROCESS compiles it exactly once into a `CompiledEngine`
  (module-level cache keyed by the payload's sha256) and reuses it for
  every Arrow batch — the "compile-once shared automaton" pattern at
  executor granularity;
* matching is an Arrow-batched pandas UDF: per signature string, ONE
  vectorized `Series.str.contains` over the whole batch (C-level regex
  loop), then per-rule boolean algebra on the masks. Row-level work
  (matched-string offsets) happens ONLY for the sparse set of hit rows.

Match semantics mirrored from src/modules/filesystem_scan.rs:1002-1136:
* rule score from meta.score, default 75, valid iff 0 < s <= 100;
* matched strings formatted "{identifier}: {value} @ {offset}" with
  printable text quoted/escaped and non-printable hex-encoded
  (format_yara_matched_data, ibid.:986-1000). Offsets here are character
  offsets; for the ASCII corpus these equal the reference's byte offsets;
* rules report in definition order; per-row YARA match cap 100.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..signatures.compile import capture_regex, literal_probe
from ..signatures.conditions import (
    ExtPred,
    _has_proper_border,
    collect_ext_atoms,
    render_condition,
)
from ..signatures.model import SignatureSet, YaraRule

# compiled forms of ioc_join's host/IPv4 patterns (identical subset in
# Java regex / RE2 / Python re — see ioc_join.HOST_PATTERN)
from .ioc_join import HOST_PATTERN, IPV4_PATTERN

_HOST_RX = re.compile(HOST_PATTERN)
_IPV4_RX = re.compile(IPV4_PATTERN)

MAX_YARA_MATCHES = 100

FNAME_MATCH_TYPE = ArrayType(
    StructType(
        [
            StructField("pattern", StringType()),
            StructField("score", IntegerType()),
            StructField("description", StringType()),
        ]
    )
)
YARA_MATCH_TYPE = ArrayType(
    StructType(
        [
            StructField("rule", StringType()),
            StructField("score", IntegerType()),
            StructField("description", StringType()),
            StructField("author", StringType()),
            StructField("reference", StringType()),
            StructField("matched_strings", ArrayType(StringType())),
        ]
    )
)
MATCH_RESULT_TYPE = StructType(
    [
        StructField("fname", FNAME_MATCH_TYPE),
        StructField("yara", YARA_MATCH_TYPE),
    ]
)

_PRINTABLE_EXTRA = {"\t", "\n", "\r"}


def format_matched_data(value: str) -> str:
    """Mirror of format_yara_matched_data (filesystem_scan.rs:986-1000):
    printable text (control chars only \\t \\n \\r allowed) is quoted with
    Rust escape_debug-style escaping, else hex of the UTF-8 bytes."""
    if all(c.isprintable() or c in _PRINTABLE_EXTRA for c in value):
        escaped = (
            value.replace("\\", "\\\\")
            .replace("'", "\\'")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\t", "\\t")
            .replace("\r", "\\r")
        )
        return f"'{escaped}'"
    return value.encode("utf-8").hex()


def string_occurrence_lines(s, rx: re.Pattern, row_text: str) -> list[str]:
    """Formatted matched_strings entries ("$id: 'data' @ offset") for one
    FIRED string on one row — shared by the arrow and pandas UDF paths.

    Three yara-x output semantics live here:
    * `private` strings are suppressed from output (they still feed the
      condition — the caller only reaches this after the rule fired);
    * the lookbehind transpile's report_shift is added back: offset
      + shift, matched data minus the literal prefix (each prefix unit
      matches exactly one char, so shift chars = the prefix match);
    * bordered plain literals enumerate ALL overlapping occurrences
      (+1-step find walk; re.finditer is non-overlapping).

    Documented output-only divergence (round-6 ADVICE, low): REGEX
    strings — including lookbehind/backref transpiles — enumerate
    occurrences with non-overlapping finditer, so a rewritten pattern
    that can self-overlap (e.g. '(?<=ab)ab' on 'ababab') reports fewer
    matched_strings entries than yara-x would. Rule FIRING is unaffected
    (the boolean kernels test containment, not counts), and a stepped
    re-enumeration for arbitrary regexes would have to answer
    leftmost-longest-vs-all-starts questions yara-x itself answers
    differently per engine — so the divergence is pinned here instead."""
    if s.private:
        return []
    out: list[str] = []
    probe = literal_probe(s)
    if probe is not None:
        needle, nocase = probe
        pin = needle.lower() if nocase else needle
        if _has_proper_border(pin):
            hay = row_text.lower() if nocase else row_text
            start = 0
            while True:
                pos = hay.find(pin, start)
                if pos < 0:
                    return out
                data = row_text[pos : pos + len(pin)]
                out.append(
                    f"{s.identifier}: {format_matched_data(data)} @ {pos}"
                )
                start = pos + 1
    shift = s.report_shift
    for m in rx.finditer(row_text):
        out.append(
            f"{s.identifier}: {format_matched_data(m.group(0)[shift:])}"
            f" @ {m.start() + shift}"
        )
    return out


@dataclass
class _CompiledYaraRule:
    rule: YaraRule
    patterns: list[tuple[str, re.Pattern]]  # (identifier, capture regex)
    ast: object  # parsed condition (signatures/conditions.py)
    strings_by_ident: dict  # identifier -> YaraString
    uses_text_ops: bool  # condition contains count/at/in/offset nodes


def _np_cmp(op: str, arr: np.ndarray, value: int) -> np.ndarray:
    if op == "eq":
        return arr == value
    if op == "ne":
        return arr != value
    if op == "gt":
        return arr > value
    if op == "ge":
        return arr >= value
    if op == "lt":
        return arr < value
    if op == "le":
        return arr <= value
    raise ValueError(f"unknown cmp op {op}")  # pragma: no cover


class ExtBits:
    """External-variable atom truth for a batch, decoded from the packed
    int64 bitmask the pipeline computes JVM-side (see
    conditions.collect_ext_atoms): atom i's per-row truth is bit i. The
    expensive string work (extension extraction, filetype classification,
    contains/regex on tool/role) thus runs in whole-stage codegen, and the
    Python bridge carries 8 bytes per row instead of the strings."""

    def __init__(
        self, bits: np.ndarray, atom_index: dict[ExtPred, int]
    ) -> None:
        self.bits = bits
        self.atom_index = atom_index

    def pred(self, p: ExtPred) -> np.ndarray:
        idx = self.atom_index[p]
        return (self.bits >> idx) & 1 == 1


class TextOps:
    """Vectorized count/at/in/offset primitives over a batch's text column
    for the yara count/offset operators (plain-ascii-literal subset,
    guaranteed by conditions.validate_condition_ops). Offsets are
    CHARACTER offsets — the matched_strings '@ {offset}' convention —
    computed with codepoint-exact kernels (utf8_slice_codeunits slices by
    codepoint; RE2 '.' consumes one codepoint)."""

    def __init__(self, arr) -> None:
        import pyarrow as pa

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        self.arr = arr

    def counts(self, needle: str, nocase: bool) -> np.ndarray:
        import pyarrow.compute as pc

        from ..signatures.conditions import (
            _has_proper_border,
            overlap_count,
        )

        out = pc.count_substring(self.arr, needle, ignore_case=nocase)
        counts = (
            pc.fill_null(out, 0)
            .to_numpy(zero_copy_only=False)
            .astype("int64")
        )
        needle_f = needle.lower() if nocase else needle
        if _has_proper_border(needle_f):
            # yara-x counts ALL occurrences including overlapping ones;
            # pc.count_substring is non-overlapping. Recount only the
            # sparse hit rows (the vectorized kernel is the prefilter)
            # with the +1-step walk — same sparse-rows pattern as
            # nth_offsets.
            for i in np.nonzero(counts > 0)[0]:
                t = self.arr[int(i)].as_py()
                tf = t.lower() if nocase else t
                counts[i] = overlap_count(tf, needle_f)
        return counts

    def at_mask(self, needle: str, nocase: bool, offset: int) -> np.ndarray:
        import pyarrow.compute as pc

        sliced = pc.utf8_slice_codeunits(
            self.arr, offset, offset + len(needle)
        )
        if nocase:
            sliced = pc.utf8_lower(sliced)
            needle = needle.lower()
        return (
            pc.fill_null(pc.equal(sliced, needle), False)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )

    def in_mask(
        self, needle: str, nocase: bool, lo: int, hi: int
    ) -> np.ndarray:
        """Some occurrence STARTS at a character offset in [lo, hi]:
        equivalent to `needle` occurring in the codepoint slice
        [lo, hi+len(needle)) — a match inside the slice starts at slice
        position q <= hi-lo exactly when the original start is <= hi.
        Slice + substring kernels instead of an RE2 '^.{lo,hi}' anchor,
        so there is NO bounded-repetition cap on the window."""
        import pyarrow.compute as pc

        sliced = pc.utf8_slice_codeunits(self.arr, lo, hi + len(needle))
        return (
            pc.fill_null(
                pc.match_substring(sliced, needle, ignore_case=nocase),
                False,
            )
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )

    def from_mask(self, needle: str, nocase: bool, lo: int) -> np.ndarray:
        """Some occurrence starts at character offset >= lo (the 'for'
        quantifier's ExistsFrom atom): `needle` occurs in the open-ended
        codepoint slice [lo, end) — slice + substring kernels, no RE2
        bounded-repetition cap."""
        import pyarrow.compute as pc

        sliced = pc.utf8_slice_codeunits(self.arr, lo)
        return (
            pc.fill_null(
                pc.match_substring(sliced, needle, ignore_case=nocase),
                False,
            )
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )

    def length_at_least(self, n: int) -> np.ndarray:
        import pyarrow.compute as pc

        return (
            pc.fill_null(
                pc.greater_equal(pc.utf8_length(self.arr), n), False
            )
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )

    def lengths(self) -> np.ndarray:
        """Character lengths (codepoints; NULL -> 0) — the filesize
        analog's length convention, shared with F.length / DuckDB
        length() / Python len()."""
        import pyarrow.compute as pc

        return (
            pc.fill_null(pc.utf8_length(self.arr), 0)
            .to_numpy(zero_copy_only=False)
            .astype("int64")
        )

    def nth_offsets(
        self, needle: str, nocase: bool, index: int, rows: np.ndarray
    ) -> dict[int, int]:
        """Character offset of the 1-based `index`-th occurrence for each
        row in `rows` (rows with fewer occurrences are omitted). Python
        str.find walk — only runs on the sparse mask-true rows."""
        needle_f = needle.lower() if nocase else needle
        out: dict[int, int] = {}
        for i in rows:
            i = int(i)
            t = self.arr[i].as_py()
            if t is None:
                continue
            tf = t.lower() if nocase else t
            pos, found, start = -1, 0, 0
            while found < index:
                pos = tf.find(needle_f, start)
                if pos < 0:
                    break
                start = pos + 1  # +1: enumerate OVERLAPPING occurrences
                found += 1
            if found == index and pos >= 0:
                out[i] = pos
        return out


class _MaskBackend:
    """Condition evaluation over numpy boolean masks — fully vectorized:
    every AST node maps to one array op over the whole batch (the @[i]
    offset walk alone is per-row, on mask-true rows only)."""

    def __init__(
        self,
        ident_masks: list[tuple[str, np.ndarray]],
        n_rows: int,
        ext,
        text_ops: TextOps | None = None,
        strings_by_ident: dict | None = None,
    ) -> None:
        self.ident_masks = ident_masks
        self.masks = dict(ident_masks)
        self.n_rows = n_rows
        self.ext = ext
        self.text_ops = text_ops
        self.strings_by_ident = strings_by_ident or {}

    def _string(self, ident: str):
        s = self.strings_by_ident.get(ident)
        if s is None or self.text_ops is None:
            raise RuntimeError(
                f"count/offset operator on {ident} without text ops wired"
            )  # pragma: no cover - validate_condition_ops guards this
        return s

    def count_cmp(self, node) -> np.ndarray:
        s = self._string(node.identifier)
        counts = self.text_ops.counts(s.pattern, s.nocase)
        return _np_cmp(node.op, counts, node.value)

    def at_expr(self, node) -> np.ndarray:
        s = self._string(node.identifier)
        return self.text_ops.at_mask(s.pattern, s.nocase, node.offset)

    def in_expr(self, node) -> np.ndarray:
        s = self._string(node.identifier)
        return self.text_ops.in_mask(s.pattern, s.nocase, node.lo, node.hi)

    def offset_cmp(self, node) -> np.ndarray:
        from ..signatures.conditions import cmp_int

        s = self._string(node.identifier)
        base = self.masks[node.identifier]
        offsets = self.text_ops.nth_offsets(
            s.pattern, s.nocase, node.index, np.nonzero(base)[0]
        )
        out = np.zeros(self.n_rows, dtype=bool)
        for i, pos in offsets.items():
            out[i] = cmp_int(node.op, pos, node.value)
        return out

    def exists_from(self, node) -> np.ndarray:
        s = self.strings_by_ident.get(node.identifier)
        if s is None or self.text_ops is None:
            raise RuntimeError(
                "exists_from without text ops wired"
            )  # pragma: no cover - engine wires text_ops for these rules
        return self.text_ops.from_mask(s.pattern, s.nocase, node.lo)

    def bool_lit(self, node) -> np.ndarray:
        return np.full(self.n_rows, node.value, dtype=bool)

    def size_cmp(self, node) -> np.ndarray:
        if self.text_ops is None:
            raise RuntimeError(
                "filesize operator without text ops wired"
            )  # pragma: no cover - engine wires text_ops for these rules
        return _np_cmp(node.op, self.text_ops.lengths(), node.value)

    def uint_cmp(self, node) -> np.ndarray:
        if self.text_ops is None:
            raise RuntimeError(
                "uint operator without text ops wired"
            )  # pragma: no cover - engine wires text_ops for these rules
        eq = self.text_ops.at_mask(node.needle, False, node.offset)
        if node.op == "eq":
            return eq
        # '!=' is false on out-of-bounds reads (yara undefined semantics)
        long_enough = self.text_ops.length_at_least(
            node.offset + node.size
        )
        return long_enough & ~eq

    def str_ref(self, ident: str) -> np.ndarray:
        return self.masks[ident]

    def of_them(self, node) -> np.ndarray:
        from ..signatures.conditions import selector_matches

        selected = [
            m
            for ident, m in self.ident_masks
            if selector_matches(node.selector, ident)
        ]
        needed = (
            1
            if node.n == "any"
            else len(selected)
            if node.n == "all"
            else int(node.n)
        )
        counts = np.zeros(self.n_rows, dtype="int32")
        for m in selected:
            counts += m
        return counts >= needed

    def ext_pred(self, p: ExtPred) -> np.ndarray:
        return self.ext.pred(p)

    def and_(self, items):
        return reduce(np.logical_and, items)

    def or_(self, items):
        return reduce(np.logical_or, items)

    def not_(self, x):
        return ~x


class CompiledEngine:
    """Per-executor compiled signature engine."""

    def __init__(self, sigs: SignatureSet) -> None:
        self.fname = [
            (
                re.compile(ioc.pattern),
                re.compile(ioc.fp_pattern) if ioc.fp_pattern else None,
                ioc,
            )
            for ioc in sigs.filename_iocs
        ]
        from ..signatures.conditions import (
            collect_size_nodes,
            collect_string_op_nodes,
            collect_uint_nodes,
        )

        self.yara: list[_CompiledYaraRule] = []
        for rule in sigs.yara_rules:
            patterns = [
                (s.identifier, capture_regex(s)) for s in rule.strings
            ]
            ast = rule.condition_ast
            self.yara.append(
                _CompiledYaraRule(
                    rule,
                    patterns,
                    ast,
                    {s.identifier: s for s in rule.strings},
                    bool(collect_string_op_nodes(ast))
                    or bool(collect_uint_nodes(ast))
                    or bool(collect_size_nodes(ast)),
                )
            )
        self.atom_index = {
            atom: i for i, atom in enumerate(collect_ext_atoms(sigs))
        }
        # J4: C2 IOC hash table for the arrow matcher's scale path. The
        # reference walks the IOC list linearly per remote address
        # (src/main.rs:614-635, first match wins); here one dict probe
        # per DISTINCT SERVER LENGTH replaces the walk — raw-endswith
        # semantics ("xbad.net" DOES match IOC "bad.net", main.rs:629)
        # reduce to host[-len(server):] == server, so probing each
        # length present in the corpus is exhaustive. Sub-linear in IOC
        # count: 5,000 IOCs of ~10 distinct lengths cost 10 probes/host.
        self.c2 = list(sigs.c2_iocs)
        self.c2_table: dict[str, tuple[int, int, str]] = {}
        for order, ioc in enumerate(self.c2):
            # duplicate servers: first in file order wins
            self.c2_table.setdefault(
                ioc.server, (order, ioc.score, ioc.description)
            )
        self.c2_lengths = sorted({len(s) for s in self.c2_table})

    def c2_lookup(self, host: str) -> tuple[int, int, str] | None:
        """First-match-wins C2 IOC for one (lowercased) host token:
        exact-only for IPv4 remotes, raw suffix-or-equality for domains
        (src/main.rs:614-635). Returns (order, score, description)."""
        if _IPV4_RX.fullmatch(host):
            return self.c2_table.get(host)
        best = None
        for length in self.c2_lengths:
            if length > len(host):
                break
            entry = self.c2_table.get(host[-length:])
            if entry is not None and (best is None or entry[0] < best[0]):
                best = entry
        return best

    def match_batch(
        self, text: pd.Series, tool: pd.Series, ext_bits: pd.Series
    ) -> pd.DataFrame:
        n = len(text)
        text = text.fillna("")
        tool = tool.fillna("")
        ext = ExtBits(
            ext_bits.fillna(0).to_numpy(dtype="int64"), self.atom_index
        )
        fname_out: list[list[dict]] = [[] for _ in range(n)]
        yara_out: list[list[dict]] = [[] for _ in range(n)]

        # J3: filename IOCs — vectorized contains per pattern.
        for rx, fp_rx, ioc in self.fname:
            mask = tool.str.contains(rx, regex=True, na=False)
            if fp_rx is not None:
                mask &= ~tool.str.contains(fp_rx, regex=True, na=False)
            for i in mask.to_numpy().nonzero()[0]:
                fname_out[i].append(
                    {
                        "pattern": ioc.pattern,
                        "score": ioc.score,
                        "description": ioc.description,
                    }
                )

        # P5: YARA subset — one vectorized pass per string pattern, then
        # per-rule condition-AST algebra on the masks; offsets only for
        # hit rows.
        text_ops: TextOps | None = None
        for compiled in self.yara:
            masks = [
                text.str.contains(rx, regex=True, na=False).to_numpy()
                for _, rx in compiled.patterns
            ]
            if compiled.uses_text_ops and text_ops is None:
                import pyarrow as pa

                text_ops = TextOps(pa.Array.from_pandas(text))
            backend = _MaskBackend(
                [
                    (ident, m)
                    for (ident, _), m in zip(compiled.patterns, masks)
                ],
                n,
                ext,
                text_ops=text_ops,
                strings_by_ident=compiled.strings_by_ident,
            )
            fired = render_condition(compiled.ast, backend)
            hits = np.asarray(fired, dtype=bool).nonzero()[0]
            for i in hits:
                if len(yara_out[i]) >= MAX_YARA_MATCHES:
                    continue
                row_text = text.iat[i]
                matched_strings: list[str] = []
                for (identifier, rx), mask, s in zip(
                    compiled.patterns, masks, compiled.rule.strings
                ):
                    if not mask[i]:
                        continue
                    matched_strings.extend(
                        string_occurrence_lines(s, rx, row_text)
                    )
                rule = compiled.rule
                yara_out[i].append(
                    {
                        "rule": rule.name,
                        "score": rule.score,
                        "description": rule.description,
                        "author": rule.author,
                        "reference": rule.reference,
                        "matched_strings": matched_strings,
                    }
                )

        return pd.DataFrame({"fname": fname_out, "yara": yara_out})


_ENGINE_CACHE: dict[str, CompiledEngine] = {}


def _engine_for(payload: bytes) -> CompiledEngine:
    key = hashlib.sha256(payload).hexdigest()
    engine = _ENGINE_CACHE.get(key)
    if engine is None:
        engine = CompiledEngine(SignatureSet.from_payload(payload))
        _ENGINE_CACHE[key] = engine
    return engine


def make_matcher_udf(spark: SparkSession, sigs: SignatureSet):
    """Build the Arrow-batched matcher UDF with the signature payload
    broadcast to executors (torrent broadcast on a real cluster; the
    compiled engine itself is cached per executor process)."""
    bc = spark.sparkContext.broadcast(sigs.to_payload())

    @pandas_udf(MATCH_RESULT_TYPE)
    def match_signatures(
        text: pd.Series, tool: pd.Series, ext_bits: pd.Series
    ) -> pd.DataFrame:
        return _engine_for(bc.value).match_batch(text, tool, ext_bits)

    return match_signatures
