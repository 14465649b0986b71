"""End-to-end spark-submit --py-files packaging test (north rule: the
pipeline ships as a spark-submit job). Runs the real binary in a
subprocess: zip the package, submit, check the summary and the exit-code
contract (2 iff alerts+warnings > 0, like the reference binary)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_job(tmp_path):
    zip_path = tmp_path / "loki_rs_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for py in (REPO / "loki_rs_spark").rglob("*.py"):
            zf.write(py, py.relative_to(REPO))
        for sig in (REPO / "signatures").rglob("*"):
            if sig.is_file():
                zf.write(sig, sig.relative_to(REPO))

    out_dir = tmp_path / "out"
    cmd = [
        _spark_submit(),
        "--master",
        "local[4]",
        str(REPO / "jobs" / "run_scan.py"),
        "--sf-dir",
        "/root/testdata/sf0.001",
        "--out",
        str(out_dir),
        "--rep",
        "2",
        "--n-buckets",
        "8",
    ]
    cmd[3:3] = ["--py-files", str(zip_path)]
    # modest driver heap: this JVM runs NEXT TO the pytest session's JVM
    # when the whole suite runs, and sf0.001 rep2 needs nothing like the
    # production default
    env = {**os.environ, "SPARK_DRIVER_MEM": "6g"}

    def run():
        return subprocess.run(
            cmd, capture_output=True, text=True, timeout=420,
            cwd=str(REPO), env=env,
        )

    proc = run()
    if proc.returncode not in (0, 1, 2):
        # infrastructure failure (JVM killed under box contention), not a
        # contract outcome — one retry before declaring defeat
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        proc = run()
    assert proc.returncode == 2, proc.stderr[-3000:]  # alerts exist => 2
    summary_lines = [
        l for l in proc.stdout.splitlines() if l.startswith("{")
    ]
    assert summary_lines, proc.stdout[-2000:]
    summary = json.loads(summary_lines[-1])
    assert summary["alerts"] > 0
    assert summary["matched"] == (
        summary["alerts"] + summary["warnings"] + summary["notices"]
    )
    assert len(summary["buckets_processed_this_run"]) == 8
    assert (out_dir / "lineage").exists()
    assert (out_dir / "routed").exists()
