"""Scale-up evidence point beyond sf0.1 (r5 verdict #6): run the scan
and the dedup family at ~5x/10x the per-round bench scale (single pass,
no gate) and record wall clock, shuffle-key skew, and peak memory — the
first measured data point for the 100x story.

* Scan: rep 8000 over sf0.1 docs = ~39.7M turns (~5x the rep-1600 bench
  table, a sf0.5-equivalent workload for the scan).
* Dedup family: DEDUP_REP x10 (= 20) -> ~100k docs through shingling,
  MinHash banding, large-star CC, SimHash and keep-best (a
  sf1-equivalent workload for the pair-generating ops, which are the
  quadratic-risk ones).
* Skew: the scale hazard for the dedup family is a hot (band_idx,
  band_hash) bucket; we record the bucket-size distribution (max, p99,
  mean) alongside the pair counts. The scan has no shuffle to skew.
* Memory: JVM heap used after each phase + driver python peak RSS.

Usage: python jobs/scaleup_probe.py [scan_rep] [dedup_rep]
Prints one JSON line; detail into BENCH/scaleup_probe.json.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _jvm_heap_mb(spark) -> int:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    return int((rt.totalMemory() - rt.freeMemory()) / (1 << 20))


def main() -> None:
    scan_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    dedup_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import loki_rs_spark.queries as q
    from loki_rs_spark.plans.pipeline import scan_transcripts
    from loki_rs_spark.session import get_spark
    from loki_rs_spark.sources.transcripts import materialized_transcripts

    spark = get_spark(app_name="scaleup-probe", master="local[32]")
    out: dict = {"scan_rep": scan_rep, "dedup_rep": dedup_rep}

    # ---- scan at ~5x ------------------------------------------------
    t0 = time.time()
    table = materialized_transcripts(spark, SF_DIR, rep=scan_rep)
    out["materialize_sec"] = round(time.time() - t0, 1)
    result = scan_transcripts(spark, table, q.bundled_signatures())
    n = result.scanned.count()
    out["scan_turns"] = n
    _noop(result.routed)  # warm (JIT + python daemons)
    t0 = time.time()
    _noop(result.routed)
    out["scan_sec"] = round(time.time() - t0, 2)
    out["scan_turns_per_sec"] = round(n / out["scan_sec"])
    out["heap_after_scan_mb"] = _jvm_heap_mb(spark)

    # ---- dedup family at 10x DEDUP_REP ------------------------------
    # The registry queries read the module-global DEDUP_REP at call
    # time; the probe raises it to measure the same plans at scale.
    q.DEDUP_REP = dedup_rep
    q._GROUPS_CACHE.clear()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name in (
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "neardup_groups_ls",
        "simhash_pairs",
        "dedup_keep_best",
    ):
        t0 = time.time()
        df = q.QUERIES[name](spark, SF_DIR)
        counts[name] = df.count()
        timings[name] = round(time.time() - t0, 2)
        print(
            f"  {name}: {timings[name]}s, {counts[name]} rows",
            file=sys.stderr,
        )
    out["dedup_sec"] = timings
    out["dedup_rows"] = counts
    out["heap_after_dedup_mb"] = _jvm_heap_mb(spark)

    # ---- skew: MinHash band-bucket size distribution -----------------
    from pyspark.sql import functions as F

    shingled = q._shingled(spark, SF_DIR).filter(F.size("shingles") > 0)
    n_docs = shingled.count()
    # rebuild the band frame shape (uid, band_idx, band_hash) and size
    # its buckets — the join-key distribution that decides 100 TB skew
    sig = shingled.select(
        "uid",
        *[
            F.array_min(
                F.transform(
                    F.col("shingles"),
                    (lambda i: lambda s: F.md5(
                        F.concat(s, F.lit(f";{i}")).cast("binary")
                    ))(i),
                )
            ).alias(f"mh{i}")
            for i in range(q.MINHASH_PERMS)
        ],
    )
    bands = sig.select(
        "uid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat(
                                *[
                                    F.col(f"mh{b * q.MINHASH_BAND + j}")
                                    for j in range(q.MINHASH_BAND)
                                ]
                            ).cast("binary")
                        ).alias("band_hash"),
                    )
                    for b in range(q.MINHASH_PERMS // q.MINHASH_BAND)
                ]
            )
        ).alias("band"),
    ).select("uid", "band.band_idx", "band.band_hash")
    dist = (
        bands.groupBy("band_idx", "band_hash")
        .count()
        .agg(
            F.max("count").alias("max"),
            F.expr("percentile_approx(count, 0.99)").alias("p99"),
            F.avg("count").alias("mean"),
            F.count("*").alias("n_buckets"),
        )
        .collect()[0]
    )
    out["band_bucket_skew"] = {
        "n_docs": n_docs,
        "max": int(dist["max"]),
        "p99": int(dist["p99"]),
        "mean": round(float(dist["mean"]), 2),
        "n_buckets": int(dist["n_buckets"]),
    }
    out["driver_peak_rss_mb"] = int(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    )
    (REPO / "BENCH" / "scaleup_probe.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
