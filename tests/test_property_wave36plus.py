"""Property-based tests (hypothesis) for the round-6 wave 36-39
operators: randomized inputs against brute-force Python models."""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    pit_features,
    time_to_next_hazard,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import cohens_kappa
from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    key_skew_histogram,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.sampling import pareto_front_2d

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = datetime.datetime(2024, 1, 1)


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    ),
    n_buckets=st.sampled_from([1, 3, 8]),
)
@settings(**_SETTINGS)
def test_pareto_front_equals_bruteforce(spark, pts, n_buckets):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(
        r.id
        for r in pareto_front_2d(df, "id", "x", "y", n_buckets=n_buckets).collect()
    )
    brute = sorted(
        i
        for (i, x, y) in rows
        if not any(
            ox >= x and oy >= y and (ox > x or oy > y) for (_, ox, oy) in rows
        )
    )
    assert got == brute


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),        # user
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=50),       # seconds
            st.integers(min_value=0, max_value=500),      # cents
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_pit_features_equals_bruteforce(spark, events):
    rows = [
        (i, u, t, _BASE + datetime.timedelta(seconds=s), c / 100.0)
        for i, (u, t, s, c) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )
    got = {r.event_id: r for r in pit_features(df).collect()}
    # brute force: per user, sort by (ts, id), accumulate strictly-prior
    expect = {}
    by_user = {}
    for i, (u, t, s, c) in enumerate(events):
        by_user.setdefault(u, []).append((s, i, t, c))
    for u, evs in by_user.items():
        evs.sort()
        for pos, (s, i, t, c) in enumerate(evs):
            prior = evs[:pos]
            if t == "purchase":
                expect[i] = (
                    len(prior),
                    sum(1 for p in prior if p[2] == "view"),
                    sum(p[3] for p in prior),
                    prior[-1][2] if prior else None,
                )
    assert set(got) == set(expect)
    for i, (ne, nv, cents, last) in expect.items():
        r = got[i]
        assert (r.n_prior_events, r.n_prior_views, r.cents_prior_value,
                r.last_prior_type) == (ne, nv, cents, last)


@given(
    gaps=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),   # user
            st.integers(min_value=0, max_value=20),  # day of purchase
        ),
        min_size=2,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_hazard_table_invariants(spark, gaps):
    rows = [
        (i, u, "purchase", _BASE + datetime.timedelta(days=d, hours=1))
        for i, (u, d) in enumerate(gaps)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = sorted(
        (r.gap_days, r.n_events, r.n_at_risk)
        for r in time_to_next_hazard(df).collect()
    )
    # brute force gaps
    by_user = {}
    for i, (u, d) in enumerate(gaps):
        by_user.setdefault(u, []).append((d, i))
    bruteg = []
    for u, ds in by_user.items():
        ds.sort()
        for a, b in zip(ds, ds[1:]):
            bruteg.append(b[0] - a[0])
    from collections import Counter

    cnt = Counter(bruteg)
    expect = sorted(
        (g, n, sum(m for h, m in cnt.items() if h >= g))
        for g, n in cnt.items()
    )
    assert got == expect
    # at-risk is non-increasing in gap_days and >= n_events
    for (g1, n1, r1), (g2, n2, r2) in zip(got, got[1:]):
        assert r1 >= r2 and r1 >= n1


@given(
    pairs=st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_kappa_equals_bruteforce(spark, pairs):
    df = spark.createDataFrame(pairs, "a boolean, b boolean")
    [r] = cohens_kappa(df, "a", "b").collect()
    n = len(pairs)
    both_t = sum(1 for a, b in pairs if a and b)
    both_f = sum(1 for a, b in pairs if not a and not b)
    po = (both_t + both_f) / n
    a_t = sum(1 for a, _ in pairs if a)
    b_t = sum(1 for _, b in pairs if b)
    pe = (a_t * b_t + (n - a_t) * (n - b_t)) / (n * n)
    assert math.isclose(r.po, po, rel_tol=1e-12)
    assert math.isclose(r.pe, pe, rel_tol=1e-12)
    if pe < 1.0:
        assert math.isclose(r.kappa, (po - pe) / (1 - pe), rel_tol=1e-9)
        assert r.kappa <= 1.0 + 1e-12
    else:
        assert r.kappa is None


@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=3000), min_size=1, max_size=20
    )
)
@settings(**_SETTINGS)
def test_key_skew_histogram_partitions_keys(spark, sizes):
    rows = [(k,) for k, n in enumerate(sizes) for _ in range(min(n, 40))]
    real = [min(n, 40) for n in sizes]
    df = spark.createDataFrame(rows, "k long")
    got = {r.log2_bucket: r for r in key_skew_histogram(df, ["k"]).collect()}
    assert sum(r.n_keys for r in got.values()) == len(real)
    assert sum(r.sum_rows for r in got.values()) == sum(real)
    for b, r in got.items():
        # every key in bucket b has size in [2^b, 2^(b+1))
        assert 2 ** b <= r.min_rows <= r.max_rows < 2 ** (b + 1)
