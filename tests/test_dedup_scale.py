"""Scale-pattern guards for the dedup/ANN operators: hot-shingle df cap,
64-bit banded SimHash, k-NN join recall vs brute force."""

from __future__ import annotations

from loki_rs_spark.queries import ngram_jaccard_pairs_from

from .conftest import SF_SMALL


def _boilerplate_frame(spark, n_docs: int):
    """n docs sharing exactly ONE boilerplate shingle (plus unique ones) —
    the pathological web-corpus shape: the shared shingle alone contributes
    n^2 join rows unless capped."""
    rows = [
        (i, ["HOT BOILER SHINGLE", f"u{i} a b", f"u{i} c d"])
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "uid long, shingles array<string>")


def test_hot_shingle_cap_drops_boilerplate(spark):
    shingled = _boilerplate_frame(spark, 200)
    # without a cap the shared shingle creates every cross pair
    uncapped = ngram_jaccard_pairs_from(
        shingled, threshold=0.0, df_cap=10**9
    ).count()
    assert uncapped == 200 * 199 // 2
    # with the cap the boilerplate shingle is dropped from the join keys
    capped = ngram_jaccard_pairs_from(
        shingled, threshold=0.0, df_cap=50
    ).count()
    assert capped == 0


def test_cap_keeps_real_neardups(spark):
    """Docs sharing MANY low-df shingles still pair up under the cap."""
    rows = [
        (0, ["s1 a b", "s2 c d", "s3 e f", "HOT BOILER SHINGLE"]),
        (1, ["s1 a b", "s2 c d", "s3 e f", "HOT BOILER SHINGLE"]),
    ] + [
        (i, [f"u{i} x y", "HOT BOILER SHINGLE"]) for i in range(2, 100)
    ]
    shingled = spark.createDataFrame(rows, "uid long, shingles array<string>")
    got = ngram_jaccard_pairs_from(shingled, threshold=0.5, df_cap=10).collect()
    assert [(r["uid_a"], r["uid_b"]) for r in got] == [(0, 1)]
    # jaccard is computed against FULL sizes: 3 shared kept shingles,
    # union 4+4-3=5 -> 0.6 (the capped shingle lowers inter AND stays in
    # the union; documented approximation, exact when no shared shingle
    # is capped)
    assert abs(got[0]["jaccard"] - 0.6) < 1e-9


def test_simhash_pairs_contains_exact_dups(spark):
    """Every exact duplicate pair (hamming 0) that simhash_groups finds
    must appear in the banded pair join; hamming values are bounded."""
    from loki_rs_spark.queries import q_simhash_pairs

    pairs = q_simhash_pairs(spark, SF_SMALL).collect()
    assert pairs, "replicated corpus must contain near-dup pairs"
    assert all(0 <= r["hamming"] <= 3 for r in pairs)
    assert any(r["hamming"] == 0 for r in pairs)
    # pair list is deduped and ordered uid_a < uid_b
    keys = [(r["uid_a"], r["uid_b"]) for r in pairs]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_explode_attachments_lineage(spark):
    """S3 explode: child rows carry parent identity + parent hash, display
    path concatenates parent->entry, parents without attachments vanish."""
    import hashlib

    from pyspark.sql import functions as F

    from loki_rs_spark.operators.attachments import explode_attachments

    parent_text = (
        "intro <<attach:a.exe>>PAYLOAD-ONE<<end>> middle "
        "<<attach:b.bin>>PAYLOAD-TWO<<end>> tail"
    )
    df = spark.createDataFrame(
        [
            ("c0", 0, "user", parent_text, "tool-x"),
            ("c0", 1, "user", "no attachments here", "tool-y"),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2026-01-01").cast("timestamp"))
    kids = explode_attachments(df).collect()
    assert len(kids) == 2  # the attachment-free parent produced nothing
    by_tool = {r["tool"]: r for r in sorted(kids, key=lambda r: r["tool"])}
    assert set(by_tool) == {"tool-x->a.exe", "tool-x->b.bin"}
    assert by_tool["tool-x->a.exe"]["text"] == "PAYLOAD-ONE"
    assert by_tool["tool-x->b.bin"]["text"] == "PAYLOAD-TWO"
    expected_md5 = hashlib.md5(parent_text.encode()).hexdigest()
    for r in kids:
        assert r["conv_id"] == "c0" and r["turn_idx"] == 0
        assert r["parent_md5"] == expected_md5


def _brute_top1(vecs: dict[int, list[float]]) -> dict[int, int]:
    import math

    def cos(u, v):
        dot = sum(x * y for x, y in zip(u, v))
        return dot / (
            math.sqrt(sum(x * x for x in u)) * math.sqrt(sum(x * x for x in v))
        )

    out = {}
    for vid, u in vecs.items():
        best = max(
            (cos(u, v), -ovid) for ovid, v in vecs.items() if ovid != vid
        )
        out[vid] = -best[1]
    return out


def test_ann_knn_join_recall_on_clustered_vectors(spark):
    """On clustered data (the case LSH exists for) the multiprobe k-NN
    join recovers the true top-1 for nearly every vector. Near-uniform
    random vectors are LSH's worst case and are NOT asserted on — the
    within-probed-buckets exactness test below covers the deterministic
    contract for arbitrary data."""
    import random

    from loki_rs_spark.queries import ANN_DIM, ann_knn_join_from

    rng = random.Random(7)
    rows = []
    vid = 0
    for _c in range(12):
        center = [rng.gauss(0, 1) for _ in range(ANN_DIM)]
        for _m in range(8):
            rows.append(
                (
                    vid,
                    [
                        float(x + rng.gauss(0, 0.05))
                        for x in center
                    ],
                )
            )
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    knn_top1 = {
        r["vec_id"]: r["neighbor_id"]
        for r in ann_knn_join_from(emb, k=1).collect()
    }
    true_top1 = _brute_top1({v: e for v, e in rows})
    hits = sum(1 for v in true_top1 if knn_top1.get(v) == true_top1[v])
    recall = hits / len(true_top1)
    assert recall >= 0.9, f"clustered recall@1 {recall:.2f}"


def test_ann_knn_join_exact_within_probed_buckets(spark):
    """Deterministic contract on the REAL embeddings table: for every
    vector, the join's top-1 equals the brute-force best among exactly the
    candidates whose bucket is within Hamming distance 1 of the probe's
    bucket."""
    import math

    from loki_rs_spark.queries import (
        ANN_PLANES,
        _ann_planes,
        q_ann_knn_join,
    )

    knn_top1 = {
        r["vec_id"]: (r["neighbor_id"], r["cos_sim"])
        for r in q_ann_knn_join(spark, SF_SMALL).collect()
        if r["rank"] == 1
    }
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: list(map(float, r["embedding"])) for r in emb}
    planes = _ann_planes()

    def bucket(v):
        b = 0
        for p in planes:
            b = b * 2 + (1 if sum(x * y for x, y in zip(v, p)) > 0 else 0)
        return b

    buckets = {vid: bucket(v) for vid, v in vecs.items()}

    def cos(u, v):
        dot = sum(x * y for x, y in zip(u, v))
        return dot / (
            math.sqrt(sum(x * x for x in u)) * math.sqrt(sum(x * x for x in v))
        )

    checked = 0
    for vid, u in vecs.items():
        probed = {buckets[vid]} | {
            buckets[vid] ^ (1 << i) for i in range(ANN_PLANES)
        }
        cands = [
            (cos(u, v), -ovid)
            for ovid, v in vecs.items()
            if ovid != vid and buckets[ovid] in probed
        ]
        if not cands:
            assert vid not in knn_top1
            continue
        best = max(cands)
        got = knn_top1.get(vid)
        assert got is not None, vid
        assert got[0] == -best[1], vid
        assert abs(got[1] - round(best[0], 4)) <= 1e-4, vid
        checked += 1
    assert checked > 0


def test_dedup_keep_best_semantics(spark):
    """Planted clusters: the kept member is the quality argmax with
    min-uid tiebreak, and n_dropped counts the rest."""
    from .conftest import SF_SMALL
    from loki_rs_spark.queries import (
        q_dedup_keep_best,
        q_neardup_groups,
        q_text_quality,  # noqa: F401 (same metric, different rep)
    )

    kept = {r.canonical_uid: r for r in
            q_dedup_keep_best(spark, SF_SMALL).collect()}
    groups = q_neardup_groups(spark, SF_SMALL).collect()
    assert kept, "fixture should contain near-dup clusters"
    by_canon: dict = {}
    for g in groups:
        by_canon.setdefault(g.canonical_uid, []).append(g)
    assert set(kept) == set(by_canon)
    for canon, members in by_canon.items():
        row = kept[canon]
        assert row.group_size == len(members)
        assert row.n_dropped == len(members) - 1
        assert any(m.uid == row.kept_uid for m in members)


def test_sample_hash_rate_and_determinism(spark):
    from .conftest import SF_SMALL
    from loki_rs_spark.queries import q_sample_hash
    from loki_rs_spark.sources.transcripts import load_transcripts
    from loki_rs_spark.queries import DEFAULT_REP

    a = sorted(r.uid for r in q_sample_hash(spark, SF_SMALL).collect())
    b = sorted(r.uid for r in q_sample_hash(spark, SF_SMALL).collect())
    assert a == b and a  # deterministic, non-empty
    total = load_transcripts(spark, SF_SMALL, rep=DEFAULT_REP).count()
    rate = len(a) / total
    assert 0.07 < rate < 0.14  # ~26/256
