"""Wave 84: Dunn pairwise post-hoc z and Cochran-Armitage trend —
brute-force references, degenerate guards, partition independence."""

from __future__ import annotations

import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    cochran_armitage_trend,
    dunn_pairwise_z,
)

GROUPS = {
    "A": [1, 2, 2, 3, 5, 8, 8, 9],
    "B": [2, 4, 4, 6, 7, 7],
    "C": [5, 5, 6, 9, 10, 11, 12],
}


def _ref_dunn(groups):
    all_vals = sorted(v for vs in groups.values() for v in vs)
    n = len(all_vals)
    ranks = {}
    i = 0
    while i < len(all_vals):
        j = i
        while j < len(all_vals) and all_vals[j] == all_vals[i]:
            j += 1
        ranks[all_vals[i]] = (i + 1 + j) / 2
        i = j
    t = sum((c := all_vals.count(u)) ** 3 - c for u in set(all_vals))
    out = {}
    keys = sorted(groups)
    for x in range(len(keys)):
        for y in range(x + 1, len(keys)):
            a, b = keys[x], keys[y]
            ma = sum(ranks[v] for v in groups[a]) / len(groups[a])
            mb = sum(ranks[v] for v in groups[b]) / len(groups[b])
            var = (n * (n + 1) / 12 - t / (12 * (n - 1))) * (
                1 / len(groups[a]) + 1 / len(groups[b])
            )
            out[(a, b)] = (ma - mb) / math.sqrt(var)
    return out


def test_dunn_matches_reference(spark):
    rows = [(v, g) for g, vs in GROUPS.items() for v in vs]
    df = spark.createDataFrame(rows, "val long, grp string")
    got = {
        (r.group_a, r.group_b): r.z_dunn
        for r in dunn_pairwise_z(df, "val", "grp").collect()
    }
    ref = _ref_dunn(GROUPS)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-10), k


def test_dunn_partition_independent(spark):
    rows = [(v, g) for g, vs in GROUPS.items() for v in vs]
    a = dunn_pairwise_z(
        spark.createDataFrame(rows, "val long, grp string"), "val", "grp"
    ).collect()
    b = dunn_pairwise_z(
        spark.createDataFrame(rows, "val long, grp string").repartition(7),
        "val",
        "grp",
    ).collect()
    key = lambda r: (r.group_a, r.group_b)  # noqa: E731
    assert sorted(map(repr, a)) == sorted(map(repr, b))
    assert len(a) == 3  # C(3,2)


def test_dunn_all_tied_null_z(spark):
    df = spark.createDataFrame(
        [(5, "A")] * 3 + [(5, "B")] * 4, "val long, grp string"
    )
    rows = dunn_pairwise_z(df, "val", "grp").collect()
    assert len(rows) == 1 and rows[0].z_dunn is None


def _ref_trend(pairs):
    """pairs: list of (score, y)"""
    n = len(pairs)
    r = sum(y for _, y in pairs)
    sn = sum(s for s, _ in pairs)
    sr = sum(s for s, y in pairs if y)
    s2n = sum(s * s for s, _ in pairs)
    diff = n * sr - r * sn
    den = r * (n - r) * (n * s2n - sn * sn) / n
    return diff / math.sqrt(den)


TREND_ROWS = (
    [(0, 0)] * 8 + [(0, 1)] * 1
    + [(1, 0)] * 6 + [(1, 1)] * 3
    + [(2, 0)] * 4 + [(2, 1)] * 5
    + [(3, 0)] * 2 + [(3, 1)] * 7
)


def test_trend_matches_reference(spark):
    df = spark.createDataFrame(
        [(s, y == 1) for s, y in TREND_ROWS], "band long, pos boolean"
    )
    row = cochran_armitage_trend(df, "band", "pos").collect()[0]
    assert row.n == len(TREND_ROWS)
    assert row.k_scores == 4
    assert row.z_trend == pytest.approx(_ref_trend(TREND_ROWS), abs=1e-10)
    assert row.z2_trend == pytest.approx(row.z_trend**2)
    assert row.z_trend > 2.5  # strongly increasing dose-response


def test_trend_constant_outcome_null(spark):
    df = spark.createDataFrame(
        [(s, True) for s in (0, 1, 2, 0, 1)], "band long, pos boolean"
    )
    row = cochran_armitage_trend(df, "band", "pos").collect()[0]
    assert row.z_trend is None


def test_trend_constant_score_null(spark):
    df = spark.createDataFrame(
        [(3, y == 1) for y in (0, 1, 0, 1)], "band long, pos boolean"
    )
    row = cochran_armitage_trend(df, "band", "pos").collect()[0]
    assert row.z_trend is None


def test_trend_sign_flips_with_direction(spark):
    inc = spark.createDataFrame(
        [(s, y == 1) for s, y in TREND_ROWS], "band long, pos boolean"
    )
    dec = spark.createDataFrame(
        [(3 - s, y == 1) for s, y in TREND_ROWS], "band long, pos boolean"
    )
    zi = cochran_armitage_trend(inc, "band", "pos").collect()[0].z_trend
    zd = cochran_armitage_trend(dec, "band", "pos").collect()[0].z_trend
    assert zi == pytest.approx(-zd, abs=1e-10)
