"""Wave 55: isotonic calibration fit (minimax PAV identity) and RxC
contingency chi-square — sequential-PAV differential, monotonicity, grid
completion, and closed-form goldens."""

from __future__ import annotations

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    isotonic_fit_bins,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    contingency_chi2,
)


def _pav(ns, ys):
    """Textbook sequential pool-adjacent-violators on (count, positives)
    bins; returns the fitted rate per original bin."""
    blocks = [[n, y] for n, y in zip(ns, ys)]  # [weight, positives]
    merged = []
    for b in blocks:
        merged.append(list(b))
        while (
            len(merged) > 1
            and merged[-2][1] * merged[-1][0]
            >= merged[-1][1] * merged[-2][0]
        ):
            n2, y2 = merged.pop()
            merged[-1][0] += n2
            merged[-1][1] += y2
    # expand back to per-bin
    out, bi = [], 0
    for n, y in merged:
        consumed = 0
        while consumed < n:
            consumed += ns[bi]
            out.append(y / n)
            bi += 1
    return out


def _fit(spark, ns, ys):
    rows = [(i, n, y) for i, (n, y) in enumerate(zip(ns, ys))]
    df = spark.createDataFrame(rows, "bin long, n long, n_pos long")
    got = isotonic_fit_bins(df, "bin", "n", "n_pos").orderBy("bin").collect()
    return [r.iso_rate for r in got]


def test_isotonic_already_monotone_is_identity(spark):
    ns = [10, 10, 10, 10]
    ys = [1, 3, 5, 9]
    assert _fit(spark, ns, ys) == pytest.approx(
        [y / n for n, y in zip(ns, ys)]
    )


def test_isotonic_single_violation_pools(spark):
    """rates [0.5, 0.0, 1.0] with equal weights: PAV pools bins 0-1 to
    0.25 and leaves bin 2 at 1.0."""
    assert _fit(spark, [2, 2, 2], [1, 0, 2]) == pytest.approx(
        [0.25, 0.25, 1.0]
    )


def test_isotonic_weighted_pool(spark):
    """rates [1.0, 0.0] with weights [1, 3] pool to 1/4."""
    assert _fit(spark, [1, 3], [1, 0]) == pytest.approx([0.25, 0.25])


def test_isotonic_differential_vs_sequential_pav(spark):
    cases = [
        ([5, 3, 8, 2, 6], [4, 1, 3, 2, 5]),
        ([1, 1, 1, 1, 1, 1], [1, 0, 1, 0, 1, 0]),
        ([10, 1, 10, 1], [9, 0, 1, 1]),
        ([4, 4, 4], [0, 4, 2]),
    ]
    for ns, ys in cases:
        got = _fit(spark, ns, ys)
        want = _pav(ns, ys)
        assert got == pytest.approx(want), (ns, ys, got, want)
        # monotone non-decreasing by construction
        assert all(a <= b + 1e-12 for a, b in zip(got, got[1:]))


def test_contingency_chi2_independence_is_zero(spark):
    """Perfectly independent 2x2 (products of marginals): every term 0."""
    rows = (
        [("a", 1)] * 4 + [("a", 2)] * 8 + [("b", 1)] * 2 + [("b", 2)] * 4
    )
    df = spark.createDataFrame(rows, "r string, c long")
    out = contingency_chi2(df, "r", "c").collect()
    assert len(out) == 4
    for row in out:
        assert row.chi2_term == pytest.approx(0.0)
        assert row.expected == pytest.approx(row.observed)


def test_contingency_chi2_grid_completion_zero_cell(spark):
    """A missing (r, c) combination appears with observed 0 and a
    positive expected/chi2 term."""
    rows = [("a", 1)] * 3 + [("a", 2)] * 3 + [("b", 1)] * 6
    df = spark.createDataFrame(rows, "r string, c long")
    out = {(r.row_val, r.col_val): r for r in contingency_chi2(df, "r", "c").collect()}
    assert len(out) == 4
    zero = out[("b", 2)]
    assert zero.observed == 0
    # e = rt*ct/n = 6*3/12 = 1.5 ; term = (0-1.5)^2/1.5 = 1.5
    assert zero.expected == pytest.approx(1.5)
    assert zero.chi2_term == pytest.approx(1.5)


def test_contingency_chi2_golden_2x2(spark):
    """Textbook 2x2 [[10, 20], [30, 40]], closed form:
    n=100, rt_a=30, rt_b=70, ct_1=40, ct_2=60.
    e_a1=12, term=(10-12)^2/12=1/3; e_a2=18, term=(20-18)^2/18=2/9;
    e_b1=28, term=(30-28)^2/28=1/7; e_b2=42, term=(40-42)^2/42=2/21."""
    rows = (
        [("a", 1)] * 10 + [("a", 2)] * 20 + [("b", 1)] * 30 + [("b", 2)] * 40
    )
    df = spark.createDataFrame(rows, "r string, c long")
    out = {(r.row_val, r.col_val): r.chi2_term for r in contingency_chi2(df, "r", "c").collect()}
    assert out[("a", 1)] == pytest.approx(1 / 3)
    assert out[("a", 2)] == pytest.approx(2 / 9)
    assert out[("b", 1)] == pytest.approx(1 / 7)
    assert out[("b", 2)] == pytest.approx(2 / 21)
    total = sum(out.values())
    assert total == pytest.approx(1 / 3 + 2 / 9 + 1 / 7 + 2 / 21)


def test_contingency_partition_independence(spark):
    rows = [("a", i % 3) for i in range(50)] + [
        ("b", i % 5) for i in range(70)
    ]
    df = spark.createDataFrame(rows, "r string, c long")
    a = {
        (r.row_val, r.col_val): (r.observed, r.chi2_term)
        for r in contingency_chi2(df, "r", "c").collect()
    }
    b = {
        (r.row_val, r.col_val): (r.observed, r.chi2_term)
        for r in contingency_chi2(df.repartition(16), "r", "c").collect()
    }
    assert a == b
