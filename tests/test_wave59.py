"""Wave 59: cohort LTV curve (cumulative integer cents, full-cohort
denominator) and degree assortativity (exact integer moments) — known
topologies and hand-computed cohorts."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    cohort_ltv_curve,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.graph import (
    degree_assortativity,
)


def _ts(day):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day)


def test_ltv_cumulative_and_full_cohort_denominator(spark):
    """Two users cohort in week 0; only one ever buys. Week-0 revenue
    1000, week-1 revenue 500 -> ltv per user 500 then 750 (divided by
    BOTH users, not just the buyer)."""
    rows = [
        ("u1", _ts(0), 1000),
        ("u1", _ts(7), 500),
        ("u2", _ts(1), 0),  # same Mon-anchored week as day 0
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, revenue_cents long")
    out = {
        r.period_offset: r
        for r in cohort_ltv_curve(df).filter("n_users = 2").collect()
    }
    assert out[0].cum_cents == 1000
    assert out[0].ltv_cents_per_user == pytest.approx(500.0)
    assert out[1].cum_cents == 1500
    assert out[1].ltv_cents_per_user == pytest.approx(750.0)


def test_ltv_cohort_isolation(spark):
    """Users first seen in different weeks land in different cohorts and
    never mix revenue."""
    rows = [
        ("a", _ts(0), 100),
        ("b", _ts(14), 900),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, revenue_cents long")
    out = cohort_ltv_curve(df).collect()
    assert len(out) == 2
    assert {r.cum_cents for r in out} == {100, 900}
    assert all(r.period_offset == 0 and r.n_users == 1 for r in out)


def test_ltv_offset_is_week_grain(spark):
    """Events 10 days apart: offsets 0 and 1 (Mon-anchored weeks), and
    the gap week does not emit a row."""
    rows = [("u", _ts(2), 10), ("u", _ts(23), 30)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, revenue_cents long")
    out = sorted(
        cohort_ltv_curve(df).collect(), key=lambda r: r.period_offset
    )
    assert [r.period_offset for r in out] == [0, 3]
    assert out[1].cum_cents == 40


def test_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative: hub (deg n) only links
    leaves (deg 1) -> r = -1 for n >= 3 leaves... exact value for a
    star with k leaves is -1 (all x!=y pairs, no variance overlap);
    textbook: any star has r = -1."""
    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], "src string, dst string"
    )
    row = degree_assortativity(edges).collect()[0]
    assert row.n_vertices == 6
    assert row.n_edges == 5
    assert row.assortativity == pytest.approx(-1.0)


def test_assortativity_regular_graph_null(spark):
    """A cycle is degree-regular (all deg 2): zero variance -> NULL."""
    n = 6
    edges = spark.createDataFrame(
        [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)],
        "src string, dst string",
    )
    row = degree_assortativity(edges).collect()[0]
    assert row.n_edges == n
    assert row.assortativity is None


def test_assortativity_brute_force(spark):
    """Arbitrary small graph vs a direct Pearson computation."""
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("d", "e"),
        ("e", "f"), ("f", "g"), ("g", "e"),
    ]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    row = degree_assortativity(edges).collect()[0]

    from collections import Counter

    und = {tuple(sorted(p)) for p in pairs}
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    m = len(xs)
    sx, sxx, sxy = sum(xs), sum(v * v for v in xs), sum(
        x * y for x, y in zip(xs, ys)
    )
    want = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert row.assortativity == pytest.approx(want)
    assert row.n_edges == len(und)


def test_assortativity_dedups_and_drops_self_loops(spark):
    """Duplicate orientations and self-loops do not distort degrees."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c")],
        "src string, dst string",
    )
    row = degree_assortativity(edges).collect()[0]
    assert row.n_edges == 2  # {a,b} and {b,c}
    assert row.n_vertices == 3
