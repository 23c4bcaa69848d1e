"""Wave 87: Brunner-Munzel and Wilson proportion CIs — brute-force
placement reference, known-value checks, degenerate guards."""

from __future__ import annotations

import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    brunner_munzel,
    proportion_ci_by_group,
)


def _midranks(sorted_vals):
    ranks, i = {}, 0
    while i < len(sorted_vals):
        j = i
        while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
            j += 1
        ranks[sorted_vals[i]] = (i + 1 + j) / 2
        i = j
    return ranks


def _ref_bm(left, right):
    """scipy.stats.brunnermunzel formulation via placements."""
    combined = sorted(left + right)
    rg = _midranks(combined)
    rl = _midranks(sorted(left))
    rr = _midranks(sorted(right))
    pl = [rg[v] - rl[v] for v in left]
    pr = [rg[v] - rr[v] for v in right]

    def mv(ps):
        n = len(ps)
        m = sum(ps) / n
        v = sum((p - m) ** 2 for p in ps) / (n - 1)
        return n, m, v

    n0, m0, v0 = mv(pl)
    n1, m1, v1 = mv(pr)
    nd = n0 + n1
    d = (m1 - m0) + (n1 - n0) / 2  # = mean global rank difference
    p_hat = d / nd + 0.5
    pooled = n0 * v0 + n1 * v1
    w = (n0 * n1 * d) / (nd * math.sqrt(pooled))
    df = pooled**2 / (
        (n0 * v0) ** 2 / (n0 - 1) + (n1 * v1) ** 2 / (n1 - 1)
    )
    return p_hat, w, df


LEFT = [1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1]
RIGHT = [3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4]


def test_bm_matches_reference(spark):
    rows = [(v, False) for v in LEFT] + [(v, True) for v in RIGHT]
    df = spark.createDataFrame(rows, "val long, is_r boolean")
    row = brunner_munzel(df, "val", "is_r").collect()[0]
    p_ref, w_ref, df_ref = _ref_bm(LEFT, RIGHT)
    assert (row.n_left, row.n_right) == (len(LEFT), len(RIGHT))
    assert row.p_hat == pytest.approx(p_ref, abs=1e-10)
    assert row.w_stat == pytest.approx(w_ref, abs=1e-10)
    assert row.df == pytest.approx(df_ref, abs=1e-8)


def test_bm_identical_distributions_p_half(spark):
    rows = [(v, False) for v in range(20)] + [(v, True) for v in range(20)]
    df = spark.createDataFrame(rows, "val long, is_r boolean")
    row = brunner_munzel(df, "val", "is_r").collect()[0]
    assert row.p_hat == pytest.approx(0.5, abs=1e-12)


def test_bm_complete_separation(spark):
    # right side entirely above left: p_hat = 1, zero placement variance
    rows = [(v, False) for v in (1, 2, 3)] + [(v, True) for v in (10, 11, 12)]
    df = spark.createDataFrame(rows, "val long, is_r boolean")
    row = brunner_munzel(df, "val", "is_r").collect()[0]
    assert row.p_hat == pytest.approx(1.0)
    assert row.w_stat is None  # pooled variance 0: statistic undefined


def test_bm_partition_independent(spark):
    rows = [(v, False) for v in LEFT] + [(v, True) for v in RIGHT]
    a = brunner_munzel(
        spark.createDataFrame(rows, "val long, is_r boolean"), "val", "is_r"
    ).collect()
    b = brunner_munzel(
        spark.createDataFrame(rows, "val long, is_r boolean").repartition(9),
        "val",
        "is_r",
    ).collect()
    assert repr(a) == repr(b)


def _ref_wilson(n, pos, z=1.96):
    p = pos / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return center - half, center + half


def test_wilson_matches_reference(spark):
    rows = [("a", i < 30) for i in range(100)] + [("b", i < 1) for i in range(4)]
    df = spark.createDataFrame(rows, "grp string, pos boolean")
    out = {r.grp: r for r in proportion_ci_by_group(df, "grp", "pos").collect()}
    lo, hi = _ref_wilson(100, 30)
    assert out["a"].share == pytest.approx(0.3)
    assert out["a"].wilson_lo == pytest.approx(lo, abs=1e-12)
    assert out["a"].wilson_hi == pytest.approx(hi, abs=1e-12)
    # Wilson stays inside [0, 1] even at tiny n / extreme p (Wald doesn't)
    b = out["b"]
    assert 0.0 <= b.wilson_lo < b.share < b.wilson_hi <= 1.0


def test_wilson_extremes_bounded(spark):
    df = spark.createDataFrame(
        [("z", True)] * 5 + [("y", False)] * 5, "grp string, pos boolean"
    )
    out = {r.grp: r for r in proportion_ci_by_group(df, "grp", "pos").collect()}
    assert out["z"].wilson_hi <= 1.0 and out["z"].wilson_lo < 1.0
    assert out["y"].wilson_lo >= 0.0 and out["y"].wilson_hi > 0.0
