"""Property-based checks (hypothesis): the Catalyst score fold agrees with
the pure-Python reference implementation on arbitrary sub-score vectors,
and severity classification is monotone in the score."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from loki_rs_spark.config import ScanConfig
from loki_rs_spark.functions.score import (
    round_half_away,
    weighted_score,
    weighted_score_col,
)

subscores = st.lists(
    st.integers(min_value=-50, max_value=100), min_size=0, max_size=12
)


@given(st.lists(subscores, min_size=1, max_size=40))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_fold_property(spark, score_lists):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, xs) for i, xs in enumerate(score_lists)], "id int, subs array<int>"
    )
    got = {
        r["id"]: r["w"]
        for r in df.select(
            "id", weighted_score_col(F.col("subs")).alias("w")
        ).collect()
    }
    for i, xs in enumerate(score_lists):
        assert got[i] == pytest.approx(weighted_score(xs), abs=1e-9), xs


@given(subscores)
@settings(max_examples=200, deadline=None)
def test_score_bounds_and_monotonicity(xs):
    s = weighted_score(xs)
    assert 0.0 <= s <= 100.0
    # adding a positive sub-score never lowers the score
    assert weighted_score(xs + [50]) >= s - 1e-9
    # permutation-invariant
    assert weighted_score(list(reversed(xs))) == pytest.approx(s, abs=1e-12)


@given(st.integers(min_value=0, max_value=100))
@settings(max_examples=101, deadline=None)
def test_severity_thresholds(score):
    cfg = ScanConfig()
    if score >= 80:
        expected = "ALERT"
    elif score >= 60:
        expected = "WARNING"
    elif score >= 40:
        expected = "NOTICE"
    else:
        expected = None
    # mirror of severity_col's CASE — kept in lockstep by this test
    got = (
        "ALERT"
        if score >= cfg.alert_threshold
        else "WARNING"
        if score >= cfg.warning_threshold
        else "NOTICE"
        if score >= cfg.notice_threshold
        else None
    )
    assert got == expected


def test_round_half_away_matches_rust_examples():
    # spot values where Python round() (banker's) would diverge
    for value, expected in [(0.5, 1), (1.5, 2), (2.5, 3), (86.5, 87), (87.5, 88)]:
        assert round_half_away(value) == expected
        assert round_half_away(value - 0.0001) == int(value - 0.5) + 0
