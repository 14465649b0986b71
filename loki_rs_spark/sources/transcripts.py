"""Deterministic multi-turn transcript table.

BASELINE.json's input_hint demands an input table of shape
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``. The sandbox testdata has no such table, so we derive one
*deterministically* from ``documents.parquet`` (driver-generated, seed=42):

* every document row is replicated ``rep`` times -> ``uid = doc_id*rep + r``
  (a dense 0..N*rep-1 key);
* ``conv_id = 'conv-' || floor(sqrt(uid))`` — conversation k owns the uid
  range [k^2, (k+1)^2), i.e. conversation LENGTH GROWS LINEARLY with k.
  This is an intentional, reproducible conversation-length skew so the
  salted-repartition path (north_rule) has real skew to defeat;
* ``turn_idx = uid - floor(sqrt(uid))^2`` (0-based position in the conv);
* signature triggers are planted by fixed residue classes of ``uid`` (the
  CASE tables below), so expected match counts are pure arithmetic.

The SAME spec is rendered two independent ways: `load_transcripts` builds the
Spark DataFrame, `transcripts_duckdb_cte` renders a DuckDB CTE for the
correctness oracle. Both are pure column expressions — no UDF, no shuffle.

Turn-vs-file role mapping (SURVEY.md top): ``text`` is the scanned content
(the reference's mmap'd file bytes), ``tool`` plays the filename/path role,
``(conv_id, turn_idx)`` replaces the file path as the stable row key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_REP = 20

ALPHA_PAYLOAD = "EICAR-TEST-PAYLOAD-ALPHA"
BETA_PAYLOAD = "EICAR-TEST-PAYLOAD-BETA"
FP_PAYLOAD = "FP-KNOWN-GOOD-PAYLOAD"

# (modulus, residue, action, payload); first matching row of the table wins
# (CASE WHEN order). 'replace' swaps the whole text (so its hash is a known
# constant for the hash-IOC path), 'append' adds a marker substring.
TEXT_RULES: tuple[tuple[int, int, str, str], ...] = (
    (101, 7, "replace", ALPHA_PAYLOAD),
    (101, 53, "replace", BETA_PAYLOAD),
    (103, 89, "replace", FP_PAYLOAD),
    (89, 11, "append", " launched netcat -e /bin/sh session"),
    (89, 37, "append", " staged meterpreter payload windows/x64"),
    (127, 17, "append", " beacon to evil-c2.example.com now"),
    (127, 59, "append", " callback 203.0.113.66 port 443"),
    (127, 83, "append", " resolve sub.evil-c2.example.com fast"),
    (127, 29, "append", " fetch from cdn.badcdn.net path /x"),
    (127, 97, "append", " see docs at good.example.org today"),
    # fullword probes: the first is word-bounded (matches `fwprobe`
    # fullword), the second embeds it inside a longer token (must NOT)
    (1009, 41, "append", " calls fwprobe directly"),
    (1009, 87, "append", " prefixfwprobe9 blocked"),
    # embedded sub-documents (S3 nested-payload explode): fenced
    # attachments whose payloads route through the same scan pipeline as
    # child turns with parent->entry display lineage
    (1013, 31, "append",
     " <<attach:inner_tool.exe>>EICAR-TEST-PAYLOAD-ALPHA<<end>>"),
    (1013, 67, "append",
     " <<attach:nested.bin>>beacon to evil-c2.example.com now<<end>>"),
    # count/at/in operator probes (count_offset.yar): a 3x marker that
    # fires '#m >= 3' vs a 1x marker that must NOT; a turn-start banner
    # firing '$b at 0' vs a mid-text one that must NOT; an offset-3 token
    # firing '$t in (2..8) and #t == 1' vs a late one (the ' pad-pad-pad '
    # prefix keeps its offset > 8 for ANY base text) and a twice-in-window
    # one that fails the '#t == 1' conjunct
    (1021, 13, "append",
     " repeat-marker-x repeat-marker-x repeat-marker-x tail"),
    (1021, 113, "append", " repeat-marker-x alone"),
    (1019, 5, "replace", "BANNER-AT-ZERO header line for the at operator"),
    (1019, 111, "append", " BANNER-AT-ZERO not at zero"),
    (1031, 17, "replace", "ab early-window-token fires in window"),
    (1031, 119, "append", " pad-pad-pad early-window-token"),
    (1031, 223, "replace",
     "zz early-window-token mid early-window-token twice"),
    # xor modifier probes (xor_base64.yar): 'SECRETMARKER' xor'd with
    # 0x0a (inside Xor_Hidden_Marker's 0x00-0x1f range -> fires), the
    # plain form (key 0x00, also in range -> fires), and xor'd with 0x20
    # (outside the range -> must NOT fire); 'KEYEDPAYLOAD' xor 0x2a for
    # the single-key form
    (1033, 21, "append", " enc YOIXO^GKXAOX blob"),
    (1033, 121, "append", " plain SECRETMARKER visible"),
    (1033, 215, "append", " lower secretmarker decoy"),
    (1039, 33, "append", " keyed aosonzksfekn payload"),
    # base64 modifier probes: a realistic stream b64('X'+payload+'ZZ')
    # containing alignment-1 of 'exfil-the-data' (fires); the PLAIN
    # literal (must NOT fire: base64 strings drop the raw form)
    (1049, 41, "append", " blob WGV4ZmlsLXRoZS1kYXRhWlo= end"),
    (1049, 141, "append", " plain exfil-the-data mention"),
    # round-6 probes (round6.yar). Overlapping-occurrence counting:
    # 'aba' occurs 3x overlapping in 'abababa' (non-overlapping counting
    # sees only 2, so '#o >= 3' distinguishes the semantics); 'ababa'
    # carries 2 overlapping -> must NOT fire
    (1051, 19, "append", " weave abababa braid"),
    (1051, 117, "append", " weave ababa braid"),
    # '0 of' none-of: trigger + clean fires '$t and 0 of ($bad*)';
    # trigger + bad token must NOT
    (1061, 23, "append", " r6-trigger clean channel"),
    (1061, 123, "append", " r6-trigger with r6-bad-token inside"),
    # private string modifier: either marker fires the rule; the private
    # one is suppressed from matched_strings (row presence identical).
    # (Residues here and below chosen so the FIRST hit uid — the residue
    # itself — is not shadowed by an earlier first-match-wins rule.)
    (1063, 47, "append", " carries r6-priv-marker quietly"),
    (1063, 129, "append", " shows r6-vis-marker openly"),
    # lookbehind-prefix transpile: >=6 [a-z0-9] chars after 'token='
    # fires; a 2-char value must NOT
    (1069, 49, "append", " auth token=abc123xyz ok"),
    (1069, 131, "append", " auth token=ab ok"),
    # backref-class expansion: MATCHING quote pair fires; mismatched
    # quotes must NOT
    (1087, 51, "append", ' set cfg "r6-value" done'),
    (1087, 137, "append", " set cfg \"r6-value' skew"),
    # wide offset window (beyond the old RE2 1000 cap): marker at char
    # offset 1200 fires '$s in (1100..4000)'; an early one must NOT
    (1091, 43, "replace", "x" * 1200 + "r6-late-marker tail"),
    (1091, 143, "replace", "early r6-late-marker present"),
    # PII-redaction probes (pii_redact query): an email+phone row and an
    # international-phone row; IP-bearing rows already exist (the
    # planted 203.0.113.66 callback at uid%127==59)
    (1093, 57, "append",
     " contact ops-lead@example.com or +1 415-555-0199 now"),
    (1093, 153, "append", " fallback pager +44 20 7946 0958 ext 12"),
)

# (modulus, residue, tool value); default tool is 'tool-' || uid % 7.
TOOL_RULES: tuple[tuple[int, int, str], ...] = (
    (97, 13, "c:/users/admin/mimikatz.exe"),
    (97, 47, "/tmp/nc.exe"),
    (97, 61, "/opt/tools/helper_config.exe"),
    (97, 73, "/opt/tools/helper_tool.exe"),
    (97, 29, "/var/agent_notice.bin"),
    (97, 83, "/tmp/lowrisk.bin"),
    (97, 89, "debug-tool-7"),
)

TS_EPOCH = "2026-01-01 00:00:00"
TS_STEP_SECONDS = 7


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_transcripts(
    spark: SparkSession,
    sf_dir: str,
    rep: int = DEFAULT_REP,
    target_partitions: int | None = None,
) -> DataFrame:
    """Spark rendering of the transcript spec.

    The sandbox's documents.parquet is a single small file — one input
    split — so we repartition the *documents* frame (cheap: pre-explode)
    to fan the derived turns across all cores. On a real 10^12-turn
    Iceberg table this step disappears: the table scan itself yields
    thousands of splits and everything downstream is narrow."""
    if target_partitions is None:
        target_partitions = spark.sparkContext.defaultParallelism * 2
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    docs = docs.repartition(target_partitions)
    turns = docs.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
    uid = (F.col("doc_id") * rep + F.col("r")).cast("long")
    turns = turns.withColumn("uid", uid).withColumnRenamed("text", "base_text")

    conv = F.floor(F.sqrt(F.col("uid").cast("double"))).cast("long")

    text_expr = F.col("base_text")
    for mod, res, action, payload in reversed(TEXT_RULES):
        cond = F.col("uid") % mod == res
        value = (
            F.lit(payload)
            if action == "replace"
            else F.concat(F.col("base_text"), F.lit(payload))
        )
        text_expr = F.when(cond, value).otherwise(text_expr)

    tool_expr = F.concat(F.lit("tool-"), (F.col("uid") % 7).cast("string"))
    for mod, res, value in reversed(TOOL_RULES):
        tool_expr = F.when(F.col("uid") % mod == res, F.lit(value)).otherwise(
            tool_expr
        )

    role_expr = (
        F.when(F.col("uid") % 4 == 0, F.lit("user"))
        .when(F.col("uid") % 4 == 1, F.lit("assistant"))
        .when(F.col("uid") % 4 == 2, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )

    ts_expr = F.expr(
        f"timestampadd(SECOND, uid * {TS_STEP_SECONDS}, "
        f"timestamp'{TS_EPOCH}')"
    )

    return turns.select(
        F.concat(F.lit("conv-"), conv.cast("string")).alias("conv_id"),
        (F.col("uid") - conv * conv).cast("int").alias("turn_idx"),
        role_expr.alias("role"),
        text_expr.alias("text"),
        tool_expr.alias("tool"),
        ts_expr.alias("ts"),
        F.col("uid"),
    )


def materialized_transcripts(
    spark: SparkSession,
    sf_dir: str,
    rep: int = DEFAULT_REP,
    base_dir: str | None = None,
    n_files: int = 64,
) -> DataFrame:
    """The transcript table as a STORED parquet table (written once per
    (sf_dir, rep), then read back) — the sandbox analog of the north
    rule's Iceberg transcript table.

    `load_transcripts` builds the table as live column expressions, which
    is fine for correctness harnesses but wrong for benchmarking the scan
    pipeline: any downstream predicate Catalyst pushes below the
    generator projection SUBSTITUTES the ~20-branch CASE trees into the
    filter, and the combined generated method blows past the JVM's JIT
    limits — an interpreted-filter cliff measured at ~10x (3.6s vs 0.36s
    per 1M rows) that a real table scan simply does not have. Scanning
    the materialized table gives the production plan shape: filters and
    column pruning push into the parquet scan, and every downstream
    reference to `text`/`tool` is a plain attribute.

    Keyed by (sf_dir basename, rep); rewritten only if the `_SUCCESS`
    marker is missing. Deterministic content (same spec as the oracle
    CTE), so reuse across processes is safe."""
    import os

    base = base_dir or os.environ.get(
        "SPARK_GRAFT_TABLE_DIR", "/tmp/loki_rs_spark_tables"
    )
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # key the cache by a hash of the generating SPEC too: planting a new
    # probe payload in TEXT_RULES/TOOL_RULES must invalidate tables
    # written by an older spec, or a stale cache would silently diverge
    # from the oracle CTE (which always renders the current spec)
    import hashlib

    spec = repr((TEXT_RULES, TOOL_RULES, TS_EPOCH, TS_STEP_SECONDS))
    spec_hash = hashlib.sha256(spec.encode()).hexdigest()[:10]
    path = f"{base}/transcripts_{name}_rep{rep}_{spec_hash}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        # write-to-temp + atomic rename: concurrent processes (e.g. two
        # bench pair servers started together) must never interleave
        # writes into the same table directory — the loser of the rename
        # race just deletes its copy and reads the winner's
        tmp = f"{path}.tmp-{os.getpid()}"
        (
            load_transcripts(spark, sf_dir, rep=rep)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, path)
        except OSError:
            import shutil

            # Only treat this as a lost race when the winner's copy is
            # actually COMPLETE: if `path` is a stale partial directory
            # without _SUCCESS (crashed earlier run), deleting tmp here
            # would silently read the broken table. Clear the stale dir
            # and retry once; another process may complete it in the
            # window, so re-check before giving up.
            if not os.path.exists(f"{path}/_SUCCESS"):
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(tmp, path)
                except OSError:
                    if not os.path.exists(f"{path}/_SUCCESS"):
                        shutil.rmtree(tmp, ignore_errors=True)
                        raise
                    shutil.rmtree(tmp, ignore_errors=True)
            else:
                shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def transcripts_duckdb_cte(sf_dir: str, rep: int = DEFAULT_REP) -> str:
    """DuckDB CTE computing the identical transcript table (the oracle's
    independent rendering). Emits a CTE named ``transcripts`` with columns
    (conv_id, turn_idx, role, text, tool, ts, uid)."""
    text_whens = []
    for mod, res, action, payload in TEXT_RULES:
        value = (
            _sql_quote(payload)
            if action == "replace"
            else f"base_text || {_sql_quote(payload)}"
        )
        text_whens.append(f"WHEN uid % {mod} = {res} THEN {value}")
    text_case = "CASE " + " ".join(text_whens) + " ELSE base_text END"

    tool_whens = [
        f"WHEN uid % {mod} = {res} THEN {_sql_quote(value)}"
        for mod, res, value in TOOL_RULES
    ]
    tool_case = (
        "CASE "
        + " ".join(tool_whens)
        + " ELSE 'tool-' || CAST(uid % 7 AS VARCHAR) END"
    )

    return f"""
_turns AS (
  SELECT d.doc_id * {rep} + r.range AS uid, d.text AS base_text
  FROM documents d CROSS JOIN range({rep}) r
),
transcripts AS (
  SELECT
    'conv-' || CAST(CAST(floor(sqrt(uid)) AS BIGINT) AS VARCHAR) AS conv_id,
    CAST(uid - CAST(floor(sqrt(uid)) AS BIGINT) * CAST(floor(sqrt(uid)) AS BIGINT) AS INTEGER) AS turn_idx,
    CASE CAST(uid % 4 AS INTEGER)
      WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' WHEN 2 THEN 'tool'
      ELSE 'assistant' END AS role,
    {text_case} AS text,
    {tool_case} AS tool,
    TIMESTAMP '{TS_EPOCH}' + INTERVAL (uid * {TS_STEP_SECONDS}) SECOND AS ts,
    uid
  FROM _turns
)
""".strip()
