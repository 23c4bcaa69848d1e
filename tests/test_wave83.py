"""Wave 83: exact Kruskal-Wallis H and Welch's t — brute-force Python
references, tie handling, degenerate guards, partition independence."""

from __future__ import annotations

import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    kruskal_wallis,
    welch_t_two_sample,
)


def _ref_kruskal(groups: dict[str, list[int]]):
    """Textbook midrank Kruskal-Wallis with tie correction."""
    all_vals = sorted(v for vs in groups.values() for v in vs)
    n = len(all_vals)
    # midrank per distinct value
    ranks = {}
    i = 0
    while i < len(all_vals):
        j = i
        while j < len(all_vals) and all_vals[j] == all_vals[i]:
            j += 1
        ranks[all_vals[i]] = (i + 1 + j) / 2
        i = j
    h = 12 / (n * (n + 1)) * sum(
        sum(ranks[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    ) - 3 * (n + 1)
    t = sum(
        (c := all_vals.count(u)) ** 3 - c for u in set(all_vals)
    )
    c = 1 - t / (n**3 - n)
    return h, h / c


def _ref_welch(left: list[int], right: list[int]):
    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, v

    n0, m0, v0 = mv(left)
    n1, m1, v1 = mv(right)
    a, b = v0 / n0, v1 / n1
    t = (m0 - m1) / math.sqrt(a + b)
    df = (a + b) ** 2 / (a * a / (n0 - 1) + b * b / (n1 - 1))
    return t, df


GROUPS = {
    "A": [1, 2, 2, 3, 5, 8, 8, 9],
    "B": [2, 4, 4, 6, 7, 7],
    "C": [5, 5, 6, 9, 10, 11, 12],
}


def _kw_df(spark, n_parts=1):
    rows = [(v, g) for g, vs in GROUPS.items() for v in vs]
    df = spark.createDataFrame(rows, "val long, grp string")
    return df.repartition(n_parts) if n_parts > 1 else df


def test_kruskal_matches_reference(spark):
    row = kruskal_wallis(_kw_df(spark), "val", "grp").collect()[0]
    h_ref, hc_ref = _ref_kruskal(GROUPS)
    assert row.n == sum(len(v) for v in GROUPS.values())
    assert row.k_groups == 3
    assert row.h == pytest.approx(h_ref, abs=1e-8)
    assert row.h_corrected == pytest.approx(hc_ref, abs=1e-8)


def test_kruskal_partition_independent(spark):
    a = kruskal_wallis(_kw_df(spark), "val", "grp").collect()[0]
    b = kruskal_wallis(_kw_df(spark, 9), "val", "grp").collect()[0]
    assert repr(a) == repr(b)


def test_kruskal_all_tied_is_null(spark):
    df = spark.createDataFrame(
        [(7, "A")] * 4 + [(7, "B")] * 3, "val long, grp string"
    )
    row = kruskal_wallis(df, "val", "grp").collect()[0]
    assert row.h is None and row.h_corrected is None


def test_kruskal_identical_distributions_small_h(spark):
    rows = [(v, g) for g in ("X", "Y") for v in range(1, 50)]
    row = kruskal_wallis(
        spark.createDataFrame(rows, "val long, grp string"), "val", "grp"
    ).collect()[0]
    assert abs(row.h_corrected) < 1e-6  # perfectly balanced ranks


LEFT = [3, 5, 5, 8, 11, 12, 14]
RIGHT = [1, 2, 2, 4, 4, 6, 9, 9]


def test_welch_matches_reference(spark):
    rows = [(v, False) for v in LEFT] + [(v, True) for v in RIGHT]
    df = spark.createDataFrame(rows, "val long, is_r boolean")
    row = welch_t_two_sample(df, "val", "is_r").collect()[0]
    t_ref, df_ref = _ref_welch(LEFT, RIGHT)
    assert (row.n_left, row.n_right) == (len(LEFT), len(RIGHT))
    assert row.t_stat == pytest.approx(t_ref, abs=1e-10)
    assert row.df == pytest.approx(df_ref, abs=1e-10)
    assert row.mean_left == pytest.approx(sum(LEFT) / len(LEFT))


def test_welch_degenerate_side_is_null(spark):
    df = spark.createDataFrame(
        [(5, False), (6, True), (7, True), (8, True)], "val long, is_r boolean"
    )
    row = welch_t_two_sample(df, "val", "is_r").collect()[0]
    assert row.t_stat is None and row.df is None


def test_welch_zero_variance_both_sides_null_t(spark):
    df = spark.createDataFrame(
        [(5, False)] * 3 + [(9, True)] * 3, "val long, is_r boolean"
    )
    row = welch_t_two_sample(df, "val", "is_r").collect()[0]
    assert row.t_stat is None  # se == 0: no basis for a t
