"""Wave 98: Page-Hinkley shift monitor + Holt linear smoothing — hand
computed goldens through the queries() registry on a synthetic slice."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, values_by_day):
    ts = datetime.datetime
    rows = [
        (i, ts(2025, 1, day, 12), 100 + i, "purchase", v, "{}")
        for i, (day, v) in enumerate(values_by_day)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_page_hinkley_golden(spark, tmp_path):
    # daily cents: [100, 100, 100, 200] -> running means 100,100,100,125
    # terms 0,0,0,+75; m = 0,0,0,75e6; running min 0 -> PH peaks day 4
    sf = _sf(spark, tmp_path, [(1, 1.0), (2, 1.0), (3, 1.0), (4, 2.0)])
    out = {
        r.day.day: r
        for r in entry_mod.queries()["page_hinkley_daily_revenue"](
            spark, sf
        ).collect()
    }
    assert [out[d].ph_micros for d in (1, 2, 3, 4)] == [0, 0, 0, 75000000]
    assert out[4].ph == pytest.approx(75.0)
    assert [out[d].is_peak for d in (1, 2, 3, 4)] == [
        False,
        False,
        False,
        True,
    ]


def test_page_hinkley_constant_series_all_peaks(spark, tmp_path):
    # constant series: every term 0, PH identically 0, every row is the
    # (tied) max — is_peak true everywhere, never NULL
    sf = _sf(spark, tmp_path, [(1, 1.0), (2, 1.0), (3, 1.0)])
    rows = entry_mod.queries()["page_hinkley_daily_revenue"](
        spark, sf
    ).collect()
    assert all(r.ph_micros == 0 and r.is_peak for r in rows)


def test_holt_linear_golden(spark, tmp_path):
    # cents [100, 200]: l1 = 100000 millis, b1 = 0;
    # l2 = (200000 + 4*100000)/5 = 120000, b2 = (20000 + 0)/10 = 2000
    sf = _sf(spark, tmp_path, [(1, 1.0), (2, 2.0)])
    r = entry_mod.queries()["holt_linear_daily_revenue"](
        spark, sf
    ).collect()[0]
    assert (r.n_days, r.level_millis, r.trend_millis) == (2, 120000, 2000)
    assert r.level == pytest.approx(120.0)
    assert r.trend == pytest.approx(2.0)
    assert r.forecast_next == pytest.approx(122.0)


def test_holt_single_day(spark, tmp_path):
    sf = _sf(spark, tmp_path, [(1, 3.0)])
    r = entry_mod.queries()["holt_linear_daily_revenue"](
        spark, sf
    ).collect()[0]
    assert (r.n_days, r.level_millis, r.trend_millis) == (1, 300000, 0)
    assert r.forecast_next == pytest.approx(300.0)


def test_holt_empty_one_row(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    r = entry_mod.queries()["holt_linear_daily_revenue"](
        spark, sf
    ).collect()[0]
    assert r.n_days == 0 and r.level_millis is None
    assert r.forecast_next is None
