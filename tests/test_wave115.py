"""Wave 115: Cliff's delta effect size + Cucconi joint location-scale
test — hand-computed goldens through the queries() registry."""

from __future__ import annotations

import datetime
import math
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, rows):
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


def test_cliffs_delta_golden(spark, tmp_path):
    # left = {1, 3}, right = {2, 4}: x1 > x2 pairs = {(3,2)} = 1,
    # x1 < x2 pairs = {(1,2),(1,4),(3,4)} = 3 -> delta = (1-3)/4 = -.5
    sf = _sf(
        spark, tmp_path,
        [(1.0, False), (3.0, False), (2.0, True), (4.0, True)],
    )
    q = entry_mod.queries()
    r = q["cliffs_delta_value_drift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right) == (2, 2)
    assert (r.pair_gt, r.pair_lt) == (1, 3)
    assert r.cliffs_delta == pytest.approx(-0.5)


def test_cliffs_delta_separation_and_ties(spark, tmp_path):
    # complete separation -> delta = -1 (left entirely below right)
    sf = _sf(
        spark, tmp_path,
        [(1.0, False), (2.0, False), (3.0, True), (4.0, True)],
    )
    q = entry_mod.queries()
    r = q["cliffs_delta_value_drift"](spark, sf).collect()[0]
    assert r.cliffs_delta == pytest.approx(-1.0)
    # identical distributions -> ties only, delta = 0
    sf2 = _sf(
        spark, tmp_path.joinpath("b"),
        [(1.0, False), (1.0, True)],
    )
    r2 = q["cliffs_delta_value_drift"](spark, sf2).collect()[0]
    assert (r2.pair_gt, r2.pair_lt) == (0, 0)
    assert r2.cliffs_delta == pytest.approx(0.0)


def test_cucconi_golden(spark, tmp_path):
    # left = {1, 2}, right = {3, 4}: pooled ranks of the right sample
    # {3, 4} -> sum R^2 = 25, sum (N+1-R)^2 = 5; sd = 6*sqrt(43);
    # U = 60/sd = 10/sqrt(43), V = -U; rho = 24/387 - 1; with V = -U
    # the quadratic form collapses to C = U^2/(1-rho) = 1.2 exactly.
    sf = _sf(
        spark, tmp_path,
        [(1.0, False), (2.0, False), (3.0, True), (4.0, True)],
    )
    q = entry_mod.queries()
    r = q["cucconi_value_drift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right) == (2, 2)
    assert r.u_stat == pytest.approx(10.0 / math.sqrt(43.0))
    assert r.v_stat == pytest.approx(-10.0 / math.sqrt(43.0))
    assert r.cucconi_c == pytest.approx(1.2)


def test_cucconi_empty_side_nulls(spark, tmp_path):
    sf = _sf(spark, tmp_path, [(1.0, False), (2.0, False), (3.0, False)])
    q = entry_mod.queries()
    r = q["cucconi_value_drift"](spark, sf).collect()[0]
    assert r.u_stat is None and r.v_stat is None and r.cucconi_c is None
    c = q["cliffs_delta_value_drift"](spark, sf).collect()[0]
    assert c.cliffs_delta is None
