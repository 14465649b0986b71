#!/usr/bin/env python
"""Auxiliary measurement harness for the optimization rounds (bench.py is
frozen for driver measurement; this file exists for guide §1.4-style
noop-sink isolation, per-query timing during development, and plan
capture). Prints one JSON line {"queries": {name: best_sec}, ...} and can
dump .explain("formatted") per query into plans/<tag>/.

Usage:
  python bench_extra.py                      # time every declared query
  python bench_extra.py q1 q2 ...            # just these queries
  SPARK_GRAFT_PLANS_DIR=plans/r07 SPARK_GRAFT_PLANS_SUFFIX=_before \
      python bench_extra.py --plans-only     # dump plans, no timing
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("SPARK_GRAFT_EXTRA_PASSES", "3"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _min_of(fn, passes: int = PASSES) -> float:
    times = []
    for _ in range(passes):
        started = time.time()
        fn()
        times.append(time.time() - started)
    return round(min(times), 3)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans_only = "--plans-only" in sys.argv
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR")
    plans_suffix = os.environ.get("SPARK_GRAFT_PLANS_SUFFIX", "")

    from loki_rs_spark.queries import QUERIES
    from loki_rs_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]")
    names = args or list(QUERIES)
    timings: dict[str, float] = {}
    for name in names:
        if name not in QUERIES:
            print(f"  unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if plans_dir:
            df = QUERIES[name](spark, SF_DIR)
            out = Path(plans_dir)
            out.mkdir(parents=True, exist_ok=True)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (out / f"{name}{plans_suffix}.txt").write_text(plan)
        if plans_only:
            continue
        if name in ("neardup_groups", "neardup_groups_ls", "dedup_keep_best"):
            # iterative / cached-composition ops: build + materialize per
            # pass, mirroring bench.py's handling
            _noop(QUERIES[name](spark, SF_DIR))  # warm
            timings[name] = _min_of(lambda: _noop(QUERIES[name](spark, SF_DIR)))
        else:
            df = QUERIES[name](spark, SF_DIR)
            _noop(df)  # warm (JIT + python daemons)
            timings[name] = _min_of(lambda: _noop(df))
        print(f"  {name}: {timings.get(name)}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": timings, "sf_dir": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
