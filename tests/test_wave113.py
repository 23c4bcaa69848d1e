"""Wave 113: rank-statistic completions — Mood's squared-rank scale
test, Jonckheere-Terpstra ordered trend, Goodman-Kruskal gamma + both
Somers' D — hand-computed goldens through the queries() registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf_events(spark, tmp_path, rows):
    ts_before = datetime.datetime(2024, 1, 5, 12)
    ts_after = datetime.datetime(2024, 2, 5, 12)
    data = [
        (i, ts_after if after else ts_before, 100 + i, "click", v, "{}")
        for i, (v, after) in enumerate(rows)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_mood_scale_golden(spark, tmp_path):
    # left = {1.00, 3.00}, right = {2.00, 2.00}; pooled midranks:
    # 100 -> 1, 200/200 -> 2.5 each, 300 -> 4; N = 4.
    # T = (1-2.5)^2 + (4-2.5)^2 = 4.5 (left holds both extremes);
    # S = 4.5 pooled, E[T] = n1/N * S = 2.25 -> wider-than-expected.
    sf = _sf_events(
        spark, tmp_path,
        [(1.0, False), (3.0, False), (2.0, True), (2.0, True)],
    )
    q = entry_mod.queries()
    r = q["mood_scale_value_drift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right) == (2, 2)
    assert r.mood_t == pytest.approx(4.5)
    assert r.expected_t == pytest.approx(2.25)


def test_mood_scale_empty_side_nulls(spark, tmp_path):
    sf = _sf_events(spark, tmp_path, [(1.0, False), (2.0, False)])
    q = entry_mod.queries()
    r = q["mood_scale_value_drift"](spark, sf).collect()[0]
    assert r.mood_t is None and r.expected_t is None


def _sf_orders(spark, tmp_path, rows):
    """rows: (status, totalprice)."""
    sf = str(tmp_path / "sfo")
    os.makedirs(sf)
    spark.createDataFrame(
        [(i, s, float(p)) for i, (s, p) in enumerate(rows)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    ).write.parquet(os.path.join(sf, "orders.parquet"))
    return sf


def test_jonckheere_golden_with_ties(spark, tmp_path):
    # groups F = {1, 2}, O = {2, 3}: strict-less cross pairs
    # (1,2) (1,3) (2,3) plus the (2,2) tie at 1/2 -> JT = 3.5;
    # E[JT] = (N^2 - sum n^2)/4 = (16 - 8)/4 = 2.
    sf = _sf_orders(
        spark, tmp_path, [("F", 1), ("F", 2), ("O", 2), ("O", 3)]
    )
    q = entry_mod.queries()
    r = q["jonckheere_price_by_status"](spark, sf).collect()[0]
    assert (r.n_total, r.n_groups) == (4, 2)
    assert r.jt_u == pytest.approx(3.5)
    assert r.expected_jt == pytest.approx(2.0)


def test_jonckheere_three_groups_monotone(spark, tmp_path):
    # F={1}, O={2}, P={3}: every ordered pair concordant -> JT = 3,
    # the monotone maximum; E = (9 - 3)/4 = 1.5.
    sf = _sf_orders(spark, tmp_path, [("F", 1), ("O", 2), ("P", 3)])
    q = entry_mod.queries()
    r = q["jonckheere_price_by_status"](spark, sf).collect()[0]
    assert (r.n_total, r.n_groups) == (3, 3)
    assert r.jt_u == pytest.approx(3.0)
    assert r.expected_jt == pytest.approx(1.5)


def test_jonckheere_single_group_nulls(spark, tmp_path):
    sf = _sf_orders(spark, tmp_path, [("F", 1), ("F", 2)])
    q = entry_mod.queries()
    r = q["jonckheere_price_by_status"](spark, sf).collect()[0]
    assert r.jt_u is None and r.expected_jt is None


def _sf_lineitem(spark, tmp_path, rows):
    """rows: (returnflag, quantity, discount)."""
    sf = str(tmp_path / "sfl")
    os.makedirs(sf)
    spark.createDataFrame(
        [(f, float(x), float(d)) for (f, x, d) in rows],
        "l_returnflag string, l_quantity double, l_discount double",
    ).write.parquet(os.path.join(sf, "lineitem.parquet"))
    return sf


def test_gamma_somers_golden(spark, tmp_path):
    # (x, y) = (1,1), (2,2), (2,3), (3,4): C = 5, D = 0,
    # x_tie_pairs = 1 (the two x=2 rows), y_tie_pairs = 0, n_pairs = 6.
    # gamma = 5/5 = 1; somers_d_yx = 5/(6-1) = 1; somers_d_xy = 5/6.
    sf = _sf_lineitem(
        spark, tmp_path,
        [("A", 1, 0.01), ("A", 2, 0.02), ("A", 2, 0.03), ("A", 3, 0.04)],
    )
    q = entry_mod.queries()
    r = q["gamma_somers_qty_discount"](spark, sf).collect()[0]
    assert r.n == 4
    assert (r.concordant, r.discordant) == (5, 0)
    assert r.gamma == pytest.approx(1.0)
    assert r.somers_d_yx == pytest.approx(1.0)
    assert r.somers_d_xy == pytest.approx(5.0 / 6.0)


def test_gamma_somers_all_tied_null(spark, tmp_path):
    # every pair tied on x -> C = D = 0 and gamma NULL (0 denominator);
    # somers_d_yx also NULL (n_pairs == x_tie_pairs)
    sf = _sf_lineitem(
        spark, tmp_path, [("A", 5, 0.01), ("A", 5, 0.02), ("A", 5, 0.03)]
    )
    q = entry_mod.queries()
    r = q["gamma_somers_qty_discount"](spark, sf).collect()[0]
    assert r.gamma is None
    assert r.somers_d_yx is None
    assert r.somers_d_xy == pytest.approx(0.0)
