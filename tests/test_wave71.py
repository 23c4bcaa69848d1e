"""Wave 71: local clustering coefficient (triangle corners, degree-
ordered wedges) and longest monotone streaks (calendar-gap islands)."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    longest_monotone_streaks,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.graph import (
    local_clustering,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_lcc_complete_graph_is_one(spark):
    verts = ["a", "b", "c", "d"]
    pairs = [(u, v) for i, u in enumerate(verts) for v in verts[i + 1 :]]
    out = {r.vertex: r for r in local_clustering(_edges(spark, pairs)).collect()}
    assert len(out) == 4
    for v in verts:
        assert out[v].degree == 3
        assert out[v].n_triangles == 3
        assert out[v].clustering_coeff == pytest.approx(1.0)


def test_lcc_star_is_zero(spark):
    pairs = [("hub", f"l{i}") for i in range(4)]
    out = {r.vertex: r for r in local_clustering(_edges(spark, pairs)).collect()}
    # leaves have degree 1 -> excluded; hub has 0 triangles
    assert set(out) == {"hub"}
    assert out["hub"].clustering_coeff == pytest.approx(0.0)


def test_lcc_triangle_plus_tail(spark):
    """Triangle a-b-c plus tail c-d: cc(a)=cc(b)=1, cc(c)=1/3 (deg 3,
    one triangle), d excluded (deg 1)."""
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    out = {r.vertex: r for r in local_clustering(_edges(spark, pairs)).collect()}
    assert out["a"].clustering_coeff == pytest.approx(1.0)
    assert out["b"].clustering_coeff == pytest.approx(1.0)
    assert out["c"].clustering_coeff == pytest.approx(1 / 3)
    assert "d" not in out


def test_lcc_brute_force(spark):
    import itertools
    import random

    rng = random.Random(13)
    verts = [f"v{i}" for i in range(10)]
    pairs = [
        (a, b)
        for a, b in itertools.combinations(verts, 2)
        if rng.random() < 0.4
    ]
    out = {r.vertex: r for r in local_clustering(_edges(spark, pairs)).collect()}
    adj = {v: set() for v in verts}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    for v in verts:
        d = len(adj[v])
        if d < 2:
            assert v not in out
            continue
        t = sum(
            1
            for x, y in itertools.combinations(sorted(adj[v]), 2)
            if y in adj[x]
        )
        assert out[v].n_triangles == t, v
        assert out[v].clustering_coeff == pytest.approx(
            2 * t / (d * (d - 1))
        )


def _days(vals, skip=None):
    d0 = datetime.date(2024, 1, 1)
    rows = []
    for i, v in enumerate(vals):
        if skip and i in skip:
            continue
        rows.append((d0 + datetime.timedelta(days=i), v))
    return rows


def test_streaks_simple(spark):
    # up 4 days (3 rises), down 3 days (2 falls)
    vals = [1, 2, 3, 4, 2, 1, 1]
    df = spark.createDataFrame(_days(vals), "day date, x long")
    row = longest_monotone_streaks(df, "day", "x").collect()[0]
    assert row.longest_up == 4
    assert row.longest_down == 3
    assert row.n_days == 7


def test_streaks_calendar_gap_breaks(spark):
    """Rising across a missing day does NOT continue the streak."""
    vals = [1, 2, 3, 4, 5, 6]
    df = spark.createDataFrame(
        _days(vals, skip={3}), "day date, x long"
    )  # days 0,1,2,4,5
    row = longest_monotone_streaks(df, "day", "x").collect()[0]
    assert row.longest_up == 3  # days 0-2; 4-5 is only a 2-streak


def test_streaks_flat_series(spark):
    df = spark.createDataFrame(_days([5, 5, 5, 5]), "day date, x long")
    row = longest_monotone_streaks(df, "day", "x").collect()[0]
    assert row.longest_up == 1
    assert row.longest_down == 1


def test_streaks_partition_independence(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = spark.createDataFrame(_days(vals), "day date, x long")
    a = longest_monotone_streaks(df, "day", "x").collect()[0]
    b = longest_monotone_streaks(df.repartition(8), "day", "x").collect()[0]
    assert (a.longest_up, a.longest_down) == (b.longest_up, b.longest_down)
