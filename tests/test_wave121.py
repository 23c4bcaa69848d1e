"""Wave 121: Ansari-Bradley scale test + Hodges-Lehmann shift estimator
+ Chatterjee's xi — hand-computed goldens through the queries()
registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf_events(spark, tmp_path, rows, sub="sf"):
    """rows: (value, after_split)."""
    ts_before = datetime.datetime(2024, 1, 5, 12)
    ts_after = datetime.datetime(2024, 2, 5, 12)
    data = [
        (i, ts_after if after else ts_before, 100 + i, "click", v, "{}")
        for i, (v, after) in enumerate(rows)
    ]
    sf = str(tmp_path / sub)
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    return sf


def _sf_li(spark, tmp_path, rows, sub="sf"):
    """rows: (qty, linestatus, disc)."""
    sf = str(tmp_path / sub)
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(float(q), s, float(d)) for (q, s, d) in rows],
        "l_quantity double, l_linestatus string, l_discount double",
    ).write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    return sf


def test_ansari_bradley_no_ties_golden(spark, tmp_path):
    # left = {1, 4}, right = {2, 3}: scores min(r, 5-r) = 1,2,2,1;
    # AB = a(1) + a(4) = 2; E = n1 * S / N = 2*6/4 = 3 -> the left
    # sample holds the rank EXTREMES (wider spread), AB < E.
    sf = _sf_events(
        spark, tmp_path,
        [(1.0, False), (4.0, False), (2.0, True), (3.0, True)],
    )
    q = entry_mod.queries()
    r = q["ansari_bradley_value_drift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right) == (2, 2)
    assert r.ab_stat == pytest.approx(2.0)
    assert r.expected_ab == pytest.approx(3.0)


def test_ansari_bradley_midrank_ties(spark, tmp_path):
    # left = {1, 2}, right = {2, 3}: midranks 1, 2.5, 2.5, 4; scores
    # min(m, N+1-m) = 1, 2.5, 2.5, 1 -> AB = 1 + 2.5 = 3.5 = E exactly
    sf = _sf_events(
        spark, tmp_path,
        [(1.0, False), (2.0, False), (2.0, True), (3.0, True)],
    )
    q = entry_mod.queries()
    r = q["ansari_bradley_value_drift"](spark, sf).collect()[0]
    assert r.ab_stat == pytest.approx(3.5)
    assert r.expected_ab == pytest.approx(3.5)


def test_ansari_bradley_empty_side_null(spark, tmp_path):
    sf = _sf_events(spark, tmp_path, [(1.0, False), (2.0, False)])
    q = entry_mod.queries()
    r = q["ansari_bradley_value_drift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right) == (2, 0)
    assert r.ab_stat is None and r.expected_ab is None


def test_hodges_lehmann_golden(spark, tmp_path):
    # left (F) = {1,2,3}, right (O) = {4,6,8}: 9 pairwise diffs sorted
    # {1,2,3,3,4,5,5,6,7}; lower median (k = 5) = 4
    sf = _sf_li(
        spark, tmp_path,
        [(1, "F", 0.0), (2, "F", 0.0), (3, "F", 0.0),
         (4, "O", 0.0), (6, "O", 0.0), (8, "O", 0.0)],
    )
    q = entry_mod.queries()
    r = q["hodges_lehmann_qty_shift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right, r.n_pairs) == (3, 3, 9)
    assert r.hl_shift == 4


def test_hodges_lehmann_even_pairs_lower_median(spark, tmp_path):
    # left = {1}, right = {2, 4}: diffs {1, 3}; k = (2+1) div 2 = 1 ->
    # the LOWER median 1 (the rounding-vs-floor regression trap)
    sf = _sf_li(
        spark, tmp_path,
        [(1, "F", 0.0), (2, "O", 0.0), (4, "O", 0.0)],
    )
    q = entry_mod.queries()
    r = q["hodges_lehmann_qty_shift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right, r.n_pairs) == (1, 2, 2)
    assert r.hl_shift == 1


def test_hodges_lehmann_empty_side_null(spark, tmp_path):
    sf = _sf_li(spark, tmp_path, [(1, "O", 0.0), (2, "O", 0.0)])
    q = entry_mod.queries()
    r = q["hodges_lehmann_qty_shift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right, r.n_pairs) == (0, 2, 0)
    assert r.hl_shift is None


def test_chatterjee_xi_perfect_monotone(spark, tmp_path):
    # x = y = 1..5 (disc = x/100): singleton tie blocks, so E[sum] is
    # just the 4 boundary |rank steps| of 1 -> exp_sum_micros = 4e6,
    # xi = 1 - 3*4/24 = 0.5 = (n-2)/(n+1), the known exact maximum
    sf = _sf_li(
        spark, tmp_path,
        [(i, "O", i / 100.0) for i in range(1, 6)],
    )
    q = entry_mod.queries()
    r = q["chatterjee_xi_qty_discount"](spark, sf).collect()[0]
    assert (r.n_total, r.exp_sum_micros) == (5, 4_000_000)
    assert r.xi == pytest.approx(0.5)


def test_chatterjee_xi_nonmonotone_golden(spark, tmp_path):
    # x = 1..4, y = (1,2,2,1): F_le ranks r = (2,4,4,2); boundary steps
    # |4-2| + 0 + |2-4| = 4 -> xi = 1 - 3*4/15 = 0.2 — nonzero where
    # a tent map's kendall tau would sit at ~0
    sf = _sf_li(
        spark, tmp_path,
        [(1, "O", 0.01), (2, "O", 0.02), (3, "O", 0.02), (4, "O", 0.01)],
    )
    q = entry_mod.queries()
    r = q["chatterjee_xi_qty_discount"](spark, sf).collect()[0]
    assert (r.n_total, r.exp_sum_micros) == (4, 4_000_000)
    assert r.xi == pytest.approx(0.2)


def test_chatterjee_xi_tied_x_expected_zero(spark, tmp_path):
    # x constant (ONE tie block), y = 1,2,3: the deterministic
    # order-by-y walk would claim xi = 1 - 3*2/8 = 0.25 spuriously; the
    # EXPECTED statistic integrates the random tie-break exactly:
    # 2*S_b = 8, E[sum] = 8/3 -> micros 2666667, xi = -1.25e-7 ~ 0
    sf = _sf_li(
        spark, tmp_path,
        [(7, "O", 0.01), (7, "O", 0.02), (7, "O", 0.03)],
    )
    q = entry_mod.queries()
    r = q["chatterjee_xi_qty_discount"](spark, sf).collect()[0]
    assert (r.n_total, r.exp_sum_micros) == (3, 2_666_667)
    assert r.xi == pytest.approx(0.0, abs=1e-5)


def test_chatterjee_xi_singleton_null(spark, tmp_path):
    sf = _sf_li(spark, tmp_path, [(1, "O", 0.01)])
    q = entry_mod.queries()
    r = q["chatterjee_xi_qty_discount"](spark, sf).collect()[0]
    assert r.n_total == 1
    assert r.xi is None
