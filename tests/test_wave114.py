"""Wave 114: time-series residual diagnostics — cumulative Ljung-Box /
Box-Pierce and Durbin-Watson — hand-computed goldens through the
queries() registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, day_values):
    """day_values: value per consecutive day starting 2024-01-01, one
    purchase event per day."""
    data = [
        (i, datetime.datetime(2024, 1, 1 + i, 12), 100, "purchase", v, "{}")
        for i, v in enumerate(day_values)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


# series 10,20,10,20 cents: centered c = 4x - 60 = -20,20,-20,20;
# den = 1600; rho1 = -1200/1600 = -.75, rho2 = .5, rho3 = -.25;
# lags 4..7 have no pairs -> portmanteau undefined from h=4 on.
ALTERNATING = [0.10, 0.20, 0.10, 0.20]


def test_ljung_box_golden(spark, tmp_path):
    sf = _sf(spark, tmp_path, ALTERNATING)
    q = entry_mod.queries()
    rows = {
        r.h: r for r in q["ljung_box_daily_revenue"](spark, sf).collect()
    }
    assert set(rows) == set(range(1, 8))
    assert rows[1].n_days == 4
    # LB(h) = n(n+2) sum rho_k^2/(n-k) = 24 * (...)
    assert rows[1].lb_stat == pytest.approx(4.5)
    assert rows[2].lb_stat == pytest.approx(7.5)
    assert rows[3].lb_stat == pytest.approx(9.0)
    # BP(h) = n sum rho_k^2
    assert rows[1].bp_stat == pytest.approx(2.25)
    assert rows[2].bp_stat == pytest.approx(3.25)
    assert rows[3].bp_stat == pytest.approx(3.5)
    for h in (4, 5, 6, 7):
        assert rows[h].lb_stat is None and rows[h].bp_stat is None


def test_ljung_box_flat_series_null(spark, tmp_path):
    sf = _sf(spark, tmp_path, [0.10, 0.10, 0.10, 0.10])
    q = entry_mod.queries()
    rows = q["ljung_box_daily_revenue"](spark, sf).collect()
    assert all(r.lb_stat is None and r.bp_stat is None for r in rows)


def test_durbin_watson_golden(spark, tmp_path):
    sf = _sf(spark, tmp_path, ALTERNATING)
    q = entry_mod.queries()
    r = q["durbin_watson_daily_revenue"](spark, sf).collect()[0]
    # num = 40^2 * 3 = 4800 over den 1600 -> DW = 3.0 (alternating
    # series = strong negative lag-1 autocorrelation, DW > 2)
    assert (r.n_days, r.n_pairs) == (4, 3)
    assert r.dw == pytest.approx(3.0)


def test_durbin_watson_flat_and_singleton(spark, tmp_path):
    sf = _sf(spark, tmp_path, [0.10, 0.10])
    q = entry_mod.queries()
    r = q["durbin_watson_daily_revenue"](spark, sf).collect()[0]
    assert r.dw is None  # zero variance
    sf2 = _sf(spark, tmp_path.joinpath("b"), [0.10])
    r2 = q["durbin_watson_daily_revenue"](spark, sf2).collect()[0]
    assert r2.n_pairs == 0 and r2.dw is None
