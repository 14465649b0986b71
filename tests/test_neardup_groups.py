"""Connected-components near-dup grouping + IVF ANN sanity tests.

neardup_groups_from resolves pairwise near-dup edges into duplicate
clusters (the keep-one-per-cluster step of a dedup pipeline); the IVF
variant must agree with the brute-force baseline on the vectors it
retrieves from the probed lists.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMALL


def _groups(spark, pairs):
    from loki_rs_spark.queries import neardup_groups_from

    df = spark.createDataFrame(pairs, "uid_a long, uid_b long")
    rows = neardup_groups_from(df).collect()
    return {r.uid: (r.canonical_uid, r.group_size) for r in rows}


def test_path_graph_collapses_to_one_component(spark):
    # 1-2, 2-3, 3-4: diameter-3 chain needs real propagation, not one hop
    got = _groups(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4)}


def test_disjoint_components_and_min_canonical(spark):
    got = _groups(spark, [(20, 10), (10, 30), (5, 6)])
    assert got == {
        10: (10, 3),
        20: (10, 3),
        30: (10, 3),
        5: (5, 2),
        6: (5, 2),
    }


def test_singletons_absent_and_duplicate_edges_ok(spark):
    got = _groups(spark, [(7, 8), (7, 8), (8, 7)])
    assert got == {7: (7, 2), 8: (7, 2)}
    assert 9 not in got


def test_star_converges_in_one_round(spark):
    got = _groups(spark, [(100, i) for i in range(101, 106)])
    assert set(got) == {100, 101, 102, 103, 104, 105}
    assert all(v == (100, 6) for v in got.values())


def _bigstar_groups(spark, pairs, **kw):
    from loki_rs_spark.queries import neardup_groups_bigstar_from

    df = spark.createDataFrame(pairs, "uid_a long, uid_b long")
    rows = neardup_groups_bigstar_from(df, **kw).collect()
    return {r.uid: (r.canonical_uid, r.group_size) for r in rows}


def test_label_prop_raises_on_deep_chain(spark):
    """A chain with diameter > max_iters must fail LOUDLY — silently
    returning partial labels would split the component."""
    from loki_rs_spark.queries import neardup_groups_from

    chain = [(i, i + 1) for i in range(8)]  # diameter 8 > max_iters 4
    df = spark.createDataFrame(chain, "uid_a long, uid_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_groups_from(df, max_iters=4).collect()


def test_bigstar_matches_label_prop_on_small_graphs(spark):
    for pairs in (
        [(1, 2), (2, 3), (3, 4)],
        [(20, 10), (10, 30), (5, 6)],
        [(7, 8), (7, 8), (8, 7)],
        [(100, i) for i in range(101, 106)],
    ):
        assert _bigstar_groups(spark, pairs) == _groups(spark, pairs)


def test_bigstar_resolves_deep_chain_in_log_rounds(spark):
    """Diameter-40 chain: label propagation would need 40 rounds; the
    large-star/small-star path must finish well inside O(log n)."""
    chain = [(i, i + 1) for i in range(40)]
    got = _bigstar_groups(spark, chain, max_iters=12)
    assert set(got) == set(range(41))
    assert all(v == (0, 41) for v in got.values())


def test_bigstar_raises_on_exhaustion(spark):
    chain = [(i, i + 1) for i in range(40)]
    from loki_rs_spark.queries import neardup_groups_bigstar_from

    df = spark.createDataFrame(chain, "uid_a long, uid_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_groups_bigstar_from(df, max_iters=1).collect()


@pytest.mark.parametrize("sf_dir", [SF_SMALL])
def test_bigstar_agrees_with_label_prop_on_fixture(spark, sf_dir):
    from loki_rs_spark.queries import q_neardup_groups, q_neardup_groups_ls

    a = sorted(map(tuple, q_neardup_groups(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_neardup_groups_ls(spark, sf_dir).collect()))
    assert a == b and a


@pytest.mark.parametrize("sf_dir", [SF_SMALL])
def test_neardup_groups_cover_minhash_pairs(spark, sf_dir):
    """Every uid in a minhash pair lands in a group; pair endpoints share
    a canonical uid; group sizes count the label multiset."""
    from loki_rs_spark.queries import q_minhash_lsh_pairs, q_neardup_groups

    pairs = q_minhash_lsh_pairs(spark, sf_dir).collect()
    groups = {
        r.uid: (r.canonical_uid, r.group_size)
        for r in q_neardup_groups(spark, sf_dir).collect()
    }
    assert pairs, "fixture should contain near-dup pairs"
    for p in pairs:
        assert groups[p.uid_a][0] == groups[p.uid_b][0]
    from collections import Counter

    sizes = Counter(c for c, _ in groups.values())
    for uid, (canon, size) in groups.items():
        assert size == sizes[canon]
        assert canon <= uid


def test_ann_ivf_plan_shape(spark):
    """The staged-alias argmin keeps the K distance aggregates single-
    evaluation in the projection: the top projection must reference the
    materialized `dists` attribute (not re-expand the array), and total
    aggregate instances stay at 24 (8 staged projection + 16 in the
    pushed-down probe filter) — the unstaged form measured 32."""
    from loki_rs_spark.queries import q_ann_ivf_topk

    df = q_ann_ivf_topk(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"array_position\(dists#\d+, array_min\(dists#\d+\)",
                     plan), "projection should consume the staged attribute"
    assert plan.count("aggregate(zip_with") <= 24


def test_ann_ivf_agrees_with_brute_force_on_probed_lists(spark):
    """IVF retrieval == brute-force ranking restricted to the probed
    lists, and every returned vector's list assignment is genuinely the
    argmin-L2 centroid (checked in python on collected vectors)."""
    from loki_rs_spark.queries import (
        IVF_K,
        IVF_NPROBE,
        _ivf_centroids,
        q_ann_ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cents = _ivf_centroids(emb)
    assert len(cents) == IVF_K

    got = q_ann_ivf_topk(spark, SF_SMALL).collect()
    assert 0 < len(got) <= 10
    # cos_sim is descending with vec_id tiebreak
    keys = [(-r.cos_sim, r.vec_id) for r in got]
    assert keys == sorted(keys)

    def dist2(vec, c):
        return sum((x - y) ** 2 for x, y in zip(vec, c))

    vecs = {
        r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()
    }
    probe_rank = sorted(
        (sum(v * v for v in c) - 2 * sum(c), i) for i, c in enumerate(cents)
    )
    probed = {i for _, i in probe_rank[:IVF_NPROBE]}
    for r in got:
        ds = [dist2(vecs[r.vec_id], c) for c in cents]
        assert ds.index(min(ds)) == r.list_id
        assert r.list_id in probed
