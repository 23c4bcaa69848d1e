"""Wave 116: partial correlation + Lin's concordance correlation —
hand-computed goldens through the queries() registry."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod


def _sf_li(spark, tmp_path, rows):
    """rows: (returnflag, qty, extprice, disc, tax, orderkey)."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(f, float(q), float(p), float(d), float(t), k)
         for (f, q, p, d, t, k) in rows],
        "l_returnflag string, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_orderkey long",
    ).write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    return sf


def _add_orders(spark, sf, rows):
    """rows: (orderkey, totalprice)."""
    spark.createDataFrame(
        [(k, float(p)) for (k, p) in rows],
        "o_orderkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(os.path.join(sf, "orders.parquet"))
    return sf


def test_partial_corr_perfect_xy(spark, tmp_path):
    # price = 10 * qty exactly -> r_xy = 1 and, since x and y then have
    # IDENTICAL correlation with z, the partial collapses to
    # (1 - r^2)/(1 - r^2) = 1 whatever discount does.
    sf = _sf_li(
        spark, tmp_path,
        [("A", 1, 10, 0.01, 0.0, 1),
         ("A", 2, 20, 0.03, 0.0, 1),
         ("A", 3, 30, 0.02, 0.0, 1)],
    )
    q = entry_mod.queries()
    r = q["partial_corr_lineitem"](spark, sf).collect()[0]
    assert r.n == 3
    assert r.r_xy == pytest.approx(1.0)
    assert r.partial_r_xy_z == pytest.approx(1.0)


def test_partial_corr_degenerate_null(spark, tmp_path):
    # constant quantity -> zero x-variance -> every stat NULL
    sf = _sf_li(
        spark, tmp_path,
        [("A", 5, 10, 0.01, 0.0, 1), ("A", 5, 20, 0.02, 0.0, 1)],
    )
    q = entry_mod.queries()
    r = q["partial_corr_lineitem"](spark, sf).collect()[0]
    assert r.r_xy is None and r.partial_r_xy_z is None


def test_ccc_biased_ledger(spark, tmp_path):
    # derived totals exactly 1.00 above the header everywhere:
    # x = {10, 20}, y = {11, 21} -> pearson 1 (pure shift) but
    # CCC = 2*cov/(vx+vy+gap^2) = 50/51 — agreement punishes the bias.
    sf = _sf_li(
        spark, tmp_path,
        [("A", 1, 11.00, 0.0, 0.0, 1), ("A", 1, 21.00, 0.0, 0.0, 2)],
    )
    _add_orders(spark, sf, [(1, 10.00), (2, 20.00)])
    q = entry_mod.queries()
    r = q["ccc_order_totals"](spark, sf).collect()[0]
    assert r.n_orders == 2
    assert r.pearson_r == pytest.approx(1.0)
    assert r.lin_ccc == pytest.approx(50.0 / 51.0)


def test_ccc_exact_agreement(spark, tmp_path):
    # header equals the line-derived total -> both statistics are 1
    sf = _sf_li(
        spark, tmp_path,
        [("A", 1, 10.00, 0.0, 0.0, 1), ("A", 1, 20.00, 0.0, 0.0, 2)],
    )
    _add_orders(spark, sf, [(1, 10.00), (2, 20.00)])
    q = entry_mod.queries()
    r = q["ccc_order_totals"](spark, sf).collect()[0]
    assert r.pearson_r == pytest.approx(1.0)
    assert r.lin_ccc == pytest.approx(1.0)


def test_ccc_constant_sides_null(spark, tmp_path):
    # a single order: zero variance on both sides -> NULL contract
    sf = _sf_li(spark, tmp_path, [("A", 1, 10.00, 0.0, 0.0, 1)])
    _add_orders(spark, sf, [(1, 10.00)])
    q = entry_mod.queries()
    r = q["ccc_order_totals"](spark, sf).collect()[0]
    assert r.pearson_r is None and r.lin_ccc is None
