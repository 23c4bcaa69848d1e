"""Wave 106: Friedman test over complete user blocks — hand-computed
golden through the queries() registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, user_type_values):
    ts = datetime.datetime
    rows = [
        (i, ts(2025, 1, 1 + i % 20, 8), u, t, v, "{}")
        for i, (u, t, v) in enumerate(user_type_values)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_friedman_golden(spark, tmp_path):
    # complete blocks (view, click, purchase cents):
    # u1 (100,200,300) -> 2r = (2,4,6); u2 (300,200,100) -> (6,4,2)
    # u3 (100,100,300) -> tie -> (3,3,6); u4 incomplete -> excluded
    # S = (11,11,14); sum s^2 = 166; den = 166 - 3*48 = 22
    # num = 1 + 1 + 4 = 6 -> Q = 2*6/22
    sf = _sf(
        spark,
        tmp_path,
        [
            (1, "view", 1.0), (1, "click", 2.0), (1, "purchase", 3.0),
            (2, "view", 3.0), (2, "click", 2.0), (2, "purchase", 1.0),
            (3, "view", 1.0), (3, "click", 1.0), (3, "purchase", 3.0),
            (4, "view", 9.0),
        ],
    )
    r = entry_mod.queries()["friedman_user_spend"](spark, sf).collect()[0]
    assert (r.n_blocks, r.k, r.df) == (3, 3, 2)
    assert (r.s_x2_0, r.s_x2_1, r.s_x2_2) == (11, 11, 14)
    assert r.q_stat == pytest.approx(12 / 22, abs=1e-9)


def test_friedman_fully_tied_null(spark, tmp_path):
    # every block fully tied -> denominator 0 -> NULL statistic
    sf = _sf(
        spark,
        tmp_path,
        [(u, t, 2.0) for u in (1, 2) for t in ("view", "click", "purchase")],
    )
    r = entry_mod.queries()["friedman_user_spend"](spark, sf).collect()[0]
    assert r.n_blocks == 2
    assert (r.s_x2_0, r.s_x2_1, r.s_x2_2) == (8, 8, 8)
    assert r.q_stat is None


def test_friedman_no_complete_blocks(spark, tmp_path):
    sf = _sf(spark, tmp_path, [(1, "view", 1.0), (2, "click", 2.0)])
    r = entry_mod.queries()["friedman_user_spend"](spark, sf).collect()[0]
    assert r.n_blocks == 0 and r.q_stat is None
