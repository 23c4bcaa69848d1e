"""Property-based tests (hypothesis) for the round-6 wave 43-46
operators: randomized inputs against brute-force Python models."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    conformal_threshold,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import feature_hash_stats
from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    jackknife_group_influence,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.sampling import (
    poisson_bootstrap_means,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    scores=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=60
    ),
    alpha_pct=st.sampled_from([5, 10, 25, 50]),
)
@settings(**_SETTINGS)
def test_conformal_is_exact_order_statistic(spark, scores, alpha_pct):
    df = spark.createDataFrame([(v,) for v in scores], "s long")
    alpha = alpha_pct / 100
    [r] = conformal_threshold(df, "s", alpha=alpha, bucket_width=37).collect()
    n = len(scores)
    target = math.ceil((n + 1) * (1 - alpha))
    assert r.n == n and r.target_rank == target
    if target > n:
        assert r.threshold is None
    else:
        assert r.threshold == sorted(scores)[target - 1]


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=50,
    ),
    n_buckets=st.sampled_from([2, 16]),
)
@settings(**_SETTINGS)
def test_feature_hash_conserves_mass(spark, rows, n_buckets):
    df = spark.createDataFrame(rows, "t string, b long")
    got = feature_hash_stats(df, ["t", "b"], n_buckets=n_buckets).collect()
    assert sum(r.n_rows for r in got) == len(rows)
    assert sum(r.n_distinct_crosses for r in got) == len(set(rows))
    assert all(0 <= r.bucket < n_buckets for r in got)
    # determinism: same input -> identical bucket assignment
    again = feature_hash_stats(df, ["t", "b"], n_buckets=n_buckets).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_jackknife_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(g, c / 100.0) for g, c in rows], "g string, value double"
    )
    got = {
        r.group: r for r in jackknife_group_influence(df, "g").collect()
    }
    from collections import defaultdict

    sums = defaultdict(int)
    ns = defaultdict(int)
    for g, c in rows:
        sums[g] += c
        ns[g] += 1
    S, N = sum(sums.values()), sum(ns.values())
    assert set(got) == set(sums)
    for g in sums:
        r = got[g]
        assert r.n_rows == ns[g]
        assert math.isclose(r.mean_cents, sums[g] / ns[g], rel_tol=1e-12)
        if N > ns[g]:
            wo = (S - sums[g]) / (N - ns[g])
            assert math.isclose(r.mean_without, wo, rel_tol=1e-12)
            assert math.isclose(r.delta_cents, wo - S / N, rel_tol=1e-9)
        else:
            assert r.mean_without is None


@given(
    n=st.integers(min_value=1, max_value=300),
    reps=st.sampled_from([4, 16]),
)
@settings(**_SETTINGS)
def test_bootstrap_total_weight_reasonable(spark, n, reps):
    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(n)], "id long, value double"
    )
    got = poisson_bootstrap_means(df, "id", n_replicas=reps).collect()
    assert len(got) == reps
    total = sum(r.n_eff for r in got)
    # Poisson(1) total mass: mean n*reps, sd sqrt(n*reps); allow 5 sigma
    assert abs(total - n * reps) <= max(5 * math.sqrt(n * reps), 8)
    # weighted sums consistent: sum_cents/n_eff == mean for each replica
    for r in got:
        if r.n_eff:
            assert math.isclose(
                r.mean_cents, r.sum_cents / r.n_eff, rel_tol=1e-12
            )
