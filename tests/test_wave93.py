"""Wave 93: order-to-ship latency percentiles and monthly slow-share —
hand-computed goldens through the queries() registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path):
    d = datetime.date
    orders = [
        (1, 10, "O", 100.0, d(1995, 1, 1), "1-URGENT"),
        (2, 11, "O", 100.0, d(1995, 1, 15), "1-URGENT"),
        (3, 12, "O", 100.0, d(1995, 2, 1), "5-LOW"),
    ]
    lines = [
        # orderkey, shipdate -> latency vs o_orderdate
        (1, d(1995, 1, 11)),   # urgent, +10
        (1, d(1995, 1, 21)),   # urgent, +20
        (2, d(1995, 5, 15)),   # urgent, +120 (slow)
        (3, d(1995, 2, 21)),   # low, +20
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(os.path.join(sf, "orders.parquet"))
    spark.createDataFrame(
        [
            (ok, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", sd)
            for ok, sd in lines
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.parquet(os.path.join(sf, "lineitem.parquet"))
    return sf


def test_latency_percentiles_golden(spark, tmp_path):
    sf = _sf(spark, tmp_path)
    out = {
        r.priority: r
        for r in entry_mod.queries()["ship_latency_percentiles_priority"](
            spark, sf
        ).collect()
    }
    u = out["1-URGENT"]
    assert u.n_lines == 3
    assert u.sum_latency_days == 10 + 20 + 120
    assert u.p50_latency == pytest.approx(20.0)
    assert u.slow_share == pytest.approx(1 / 3)
    lo = out["5-LOW"]
    assert lo.n_lines == 1 and lo.slow_share == 0.0


def test_slow_monthly_golden(spark, tmp_path):
    sf = _sf(spark, tmp_path)
    out = sorted(
        entry_mod.queries()["slow_fulfillment_monthly"](spark, sf).collect(),
        key=lambda r: r.month_key,
    )
    jan, feb = out
    assert (jan.month_key, jan.n_lines, jan.n_slow) == (199501, 3, 1)
    assert (feb.month_key, feb.n_lines, feb.n_slow) == (199502, 1, 0)
    assert jan.mom_delta is None
    assert feb.mom_delta == pytest.approx(0.0 - 1 / 3)
