"""Wave 122: customer-spend inequality index family (Gini / Theil T /
Theil L / Atkinson(1)) — hand-computed goldens through the queries()
registry."""

from __future__ import annotations

import math
import os

import pytest

import __spark_entry__ as entry_mod


def _sf_orders(spark, tmp_path, rows, sub="sf"):
    """rows: (custkey, totalprice)."""
    sf = str(tmp_path / sub)
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, k, float(p)) for i, (k, p) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(os.path.join(sf, "orders.parquet"))
    return sf


def _lmic(cents: int) -> int:
    return round(1e6 * math.log(cents))


def test_inequality_two_customer_golden(spark, tmp_path):
    # spends 100 and 300 cents: gini of (1, 3) = 0.25 exactly; Theil
    # terms recomputed through the SAME micro-quantized-log convention
    sf = _sf_orders(spark, tmp_path, [(1, 1.0), (2, 3.0)])
    q = entry_mod.queries()
    r = q["spend_inequality_customers"](spark, sf).collect()[0]
    assert (r.n_customers, r.total_cents) == (2, 400)
    assert r.gini == pytest.approx(0.25)
    sxl = 100 * _lmic(100) + 300 * _lmic(300)
    t_exp = sxl / (1e6 * 400) - math.log(400 / 2)
    assert r.theil_t == pytest.approx(t_exp, rel=1e-12)
    sl = _lmic(100) + _lmic(300)
    l_exp = math.log(400 / 2) - sl / (1e6 * 2)
    assert r.theil_l == pytest.approx(l_exp, rel=1e-12)
    assert r.atkinson_1 == pytest.approx(1.0 - math.exp(-l_exp), rel=1e-12)
    # sanity against the exact (unquantized) indices
    assert r.theil_t == pytest.approx(
        0.5 * (0.5 * math.log(0.5) + 1.5 * math.log(1.5)), abs=1e-5
    )


def test_inequality_all_equal_degenerate(spark, tmp_path):
    # identical spends: gini EXACTLY 0 (integer core), Theil/Atkinson 0
    # up to the documented half-micro quantization bound
    sf = _sf_orders(spark, tmp_path, [(k, 2.5) for k in range(1, 5)])
    q = entry_mod.queries()
    r = q["spend_inequality_customers"](spark, sf).collect()[0]
    assert (r.n_customers, r.total_cents) == (4, 1000)
    assert r.gini == 0.0
    assert r.theil_t == pytest.approx(0.0, abs=1e-6)
    assert r.theil_l == pytest.approx(0.0, abs=1e-6)
    assert r.atkinson_1 == pytest.approx(0.0, abs=1e-6)


def test_inequality_multi_order_customer_and_ties(spark, tmp_path):
    # a customer's orders aggregate BEFORE the grid (two 1.0 orders =
    # one 200-cent customer) and tied spends share the midrank exactly:
    # spends (200, 200, 400): gini = (2*(1.5*200 + 1.5*200 + 3*400))
    #   / (3*800) - 4/3 = 3600/2400 - 4/3 = 1/6
    sf = _sf_orders(
        spark, tmp_path,
        [(1, 1.0), (1, 1.0), (2, 2.0), (3, 4.0)],
    )
    q = entry_mod.queries()
    r = q["spend_inequality_customers"](spark, sf).collect()[0]
    assert (r.n_customers, r.total_cents) == (3, 800)
    assert r.gini == pytest.approx(1.0 / 6.0)


def test_inequality_empty_null(spark, tmp_path):
    sf = _sf_orders(spark, tmp_path, [])
    q = entry_mod.queries()
    r = q["spend_inequality_customers"](spark, sf).collect()[0]
    assert (r.n_customers, r.total_cents) == (0, 0)
    assert r.gini is None and r.theil_t is None
    assert r.theil_l is None and r.atkinson_1 is None
