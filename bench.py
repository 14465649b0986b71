#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "turns": N, "turns_per_sec_local8": ..., "turns_per_sec_local32": ...,
   "scaling_efficiency_8_to_32": ...}

The scan throughput is measured in a FRESH JVM per parallelism level
(local[8] vs local[32] on identical input) — the sandbox proxy for the
north rule's N-vs-4N-executor scaling criterion. Per-query timings run
in-process at local[$SPARK_GRAFT_CPUS]. All sinks are `noop` writes so
the full pipeline materializes without driver collection.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_REP = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "800"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _scan_worker(master: str, sf_dir: str, rep: int) -> None:
    """Runs in a fresh JVM: full scan pipeline, prints JSON to stdout."""
    from loki_rs_spark.plans.pipeline import scan_transcripts
    from loki_rs_spark.queries import bundled_signatures
    from loki_rs_spark.session import get_spark
    from loki_rs_spark.sources.transcripts import load_transcripts

    cores = int(master.split("[")[1].rstrip("]"))
    spark = get_spark(
        app_name=f"bench-{master}", master=master, shuffle_partitions=cores
    )
    transcripts = load_transcripts(spark, sf_dir, rep=rep)
    result = scan_transcripts(spark, transcripts, bundled_signatures())
    n_turns = result.scanned.count()  # cheap: no UDF in this subplan
    # 3 warm-up passes (python-daemon spawn + C2 JIT needs several
    # iterations to reach steady state), then min of 3 measured passes —
    # single-run timings on this box swing 2x from JIT recompilation, so
    # the steady-state minimum is the honest number.
    for _ in range(3):
        _noop(result.routed)
    times = []
    for _ in range(3):
        started = time.time()
        _noop(result.routed)
        times.append(time.time() - started)
    print(json.dumps({"elapsed": min(times), "turns": n_turns,
                      "all_runs": [round(t, 2) for t in times]}))
    spark.stop()


def _run_scan_subprocess(master: str) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--scan-worker", master, SF_DIR,
         str(BENCH_REP)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=str(REPO),
    )
    last = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not last:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"scan worker {master} produced no JSON")
    return json.loads(last[-1])


def _time_queries(spark) -> dict[str, float]:
    from loki_rs_spark.queries import QUERIES

    names = [
        "scan_matches",
        "severity_counts",
        "rule_match_counts",
        "per_conv_rollup",
        "dedup_exact",
        "token_stats",
        "content_fingerprint",
        "ngram_jaccard_pairs",
        "ann_cosine_topk",
    ]
    timings = {}
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        _noop(df)  # warm (JIT + python daemons)
        started = time.time()
        _noop(df)
        timings[name] = round(time.time() - started, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
    return timings


def main() -> None:
    total_started = time.time()
    print(f"bench: sf_dir={SF_DIR} rep={BENCH_REP}", file=sys.stderr)

    r2 = _run_scan_subprocess("local[2]")
    print(f"  local[2]: {r2}", file=sys.stderr)
    r8 = _run_scan_subprocess("local[8]")
    print(f"  local[8]: {r8}", file=sys.stderr)
    r32 = _run_scan_subprocess(f"local[{CPUS}]")
    print(f"  local[{CPUS}]: {r32}", file=sys.stderr)

    thr2 = r2["turns"] / r2["elapsed"]
    thr8 = r8["turns"] / r8["elapsed"]
    thr32 = r32["turns"] / r32["elapsed"]
    eff_2_8 = (thr8 / thr2) / 4
    eff_8_32 = (thr32 / thr8) / (CPUS / 8)

    from loki_rs_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", master=f"local[{CPUS}]")
    queries = _time_queries(spark)
    queries["scan_pipeline_local2"] = round(r2["elapsed"], 3)
    queries["scan_pipeline_local8"] = round(r8["elapsed"], 3)
    queries[f"scan_pipeline_local{CPUS}"] = round(r32["elapsed"], 3)
    spark.stop()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "scan_pipeline_total_sec",
        "value": round(time.time() - total_started, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns": r32["turns"],
        "turns_per_sec_local2": round(thr2, 1),
        "turns_per_sec_local8": round(thr8, 1),
        f"turns_per_sec_local{CPUS}": round(thr32, 1),
        # N vs 4N executor-scaling evidence (see BENCH/BASELINE.md): the
        # 2->8 pair is below this single box's memory-bandwidth/Python-
        # bridge saturation point; 8->32 shares one bus and one loopback.
        "scaling_efficiency_2_to_8": round(eff_2_8, 3),
        "scaling_efficiency_8_to_32": round(eff_8_32, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scan-worker":
        _scan_worker(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    else:
        main()
