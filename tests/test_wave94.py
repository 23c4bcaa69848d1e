"""Wave 94: monthly priority mix and per-nation repeat rate — goldens
through the queries() registry on a synthetic slice."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path):
    d = datetime.date
    orders = [
        # custkey 1: 2 orders (repeat); 2: 1; 3: 3 (repeat, other nation)
        (1, 1, "O", 1.0, d(1995, 1, 5), "1-URGENT"),
        (2, 1, "O", 1.0, d(1995, 1, 20), "5-LOW"),
        (3, 2, "O", 1.0, d(1995, 1, 25), "1-URGENT"),
        (4, 3, "O", 1.0, d(1995, 2, 5), "1-URGENT"),
        (5, 3, "O", 1.0, d(1995, 2, 6), "1-URGENT"),
        (6, 3, "O", 1.0, d(1995, 2, 7), "5-LOW"),
    ]
    customers = [(1, 10), (2, 10), (3, 20), (4, 20)]  # cust 4 never orders
    nations = [(10, "FRANCE"), (20, "KENYA")]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(os.path.join(sf, "orders.parquet"))
    spark.createDataFrame(
        customers, "c_custkey long, c_nationkey long"
    ).write.parquet(os.path.join(sf, "customer.parquet"))
    spark.createDataFrame(
        nations, "n_nationkey long, n_name string"
    ).write.parquet(os.path.join(sf, "nation.parquet"))
    return sf


def test_priority_mix_golden(spark, tmp_path):
    sf = _sf(spark, tmp_path)
    out = {
        (r.month_key, r.priority): r
        for r in entry_mod.queries()["order_priority_mix_monthly"](
            spark, sf
        ).collect()
    }
    assert out[(199501, "1-URGENT")].n_orders == 2
    assert out[(199501, "1-URGENT")].month_share == pytest.approx(2 / 3)
    assert out[(199502, "5-LOW")].month_share == pytest.approx(1 / 3)
    # shares sum to 1 within each month
    for mk in (199501, 199502):
        assert sum(
            r.month_share for k, r in out.items() if k[0] == mk
        ) == pytest.approx(1.0)


def test_repeat_rate_golden(spark, tmp_path):
    sf = _sf(spark, tmp_path)
    out = {
        r.nation: r
        for r in entry_mod.queries()["customer_repeat_rate_nation"](
            spark, sf
        ).collect()
    }
    fr = out["FRANCE"]
    assert (fr.n_buyers, fr.n_repeat, fr.n_orders) == (2, 1, 3)
    assert fr.repeat_rate == pytest.approx(0.5)
    assert fr.orders_per_buyer == pytest.approx(1.5)
    ke = out["KENYA"]
    assert (ke.n_buyers, ke.n_repeat) == (1, 1)  # non-buyer cust 4 excluded
    assert ke.orders_per_buyer == pytest.approx(3.0)
