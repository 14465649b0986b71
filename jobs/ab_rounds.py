"""Interleaved code-A/B of the local[32] scan leg (r5 verdict #5): the
round-5 driver file showed a 16% raw local[32] dip vs round 4 (7.96s
best vs 6.72s) while the pass history [36.0, 11.0, 8.28, 7.96] suggested
a still-warming window. Settle window-vs-code by running BOTH code
versions' scan workers strictly interleaved on the same warmed window,
min-of-N each.

The old code runs from a read-only git worktree (default: the round-4
final commit). Each leg is a fresh-JVM credit-gated min-of-4 pass via
that version's own `bench.py --scan-worker`. Input tables differ only by
the handful of planted probe rows added since (<0.01% of 7.9M turns).

Usage: python jobs/ab_rounds.py [old_commit] [rep] [rounds]
Prints one JSON line; detail into BENCH/ab_rounds.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _leg(bench_path: Path, rep: int) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            str(bench_path),
            "--scan-worker",
            "local[32]",
            SF_DIR,
            str(rep),
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    old_commit = sys.argv[1] if len(sys.argv) > 1 else "dbfa99e"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    wt = Path("/tmp/ab_worktree_" + old_commit)
    if not (wt / "bench.py").exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(wt), old_commit],
            cwd=REPO,
            check=True,
        )
    old_runs, new_runs, legs = [], [], []
    for i in range(rounds):
        # alternate starting side per round so window drift within a
        # round has no systematic direction
        order = (
            [("old", wt), ("new", REPO)]
            if i % 2 == 0
            else [("new", REPO), ("old", wt)]
        )
        for label, root in order:
            r = _leg(root / "bench.py", rep)
            r["code"], r["round"] = label, i
            legs.append(r)
            (old_runs if label == "old" else new_runs).append(r["elapsed"])
            print(
                f"  round {i} {label}: {r['elapsed']:.2f}s "
                f"best of {r['all_runs']}",
                file=sys.stderr,
            )
    result = {
        "old_commit": old_commit,
        "rep": rep,
        "rounds": rounds,
        "old_best": min(old_runs),
        "new_best": min(new_runs),
        "old_runs": old_runs,
        "new_runs": new_runs,
        "new_over_old": round(min(new_runs) / min(old_runs), 3),
    }
    (REPO / "BENCH" / "ab_rounds.json").write_text(
        json.dumps({"result": result, "legs": legs}, indent=1)
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
