"""Wave 66: Theil-Sen robust trend (order-statistic median slope) and
day-of-week seasonality — brute-force medians, outlier robustness,
integer-weekday anchoring."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    dow_seasonality,
    theil_sen_trend,
)


def _days(vals):
    d0 = datetime.date(2024, 1, 1)
    return [(d0 + datetime.timedelta(days=i), v) for i, v in enumerate(vals)]


def _brute_theil_sen(vals):
    """Lower-median pairwise slope + lower-median residual intercept."""
    pts = list(enumerate(vals))
    slopes = sorted(
        ((y2 - y1) / (x2 - x1), x1, x2)
        for (x1, y1) in pts
        for (x2, y2) in pts
        if x1 < x2
    )
    m = len(slopes)
    slope = slopes[(m + 1) // 2 - 1][0]
    resid = sorted((y - slope * x, x) for x, y in pts)
    b = resid[(len(pts) + 1) // 2 - 1][0]
    return slope, b


def test_theil_sen_perfect_line(spark):
    vals = [100 + 7 * i for i in range(12)]
    df = spark.createDataFrame(_days(vals), "day date, x long")
    row = theil_sen_trend(df, "day", "x").collect()[0]
    assert row.slope_per_day == pytest.approx(7.0)
    assert row.n_pairs == 66


def test_theil_sen_outlier_robust(spark):
    """One wild spike barely moves the slope (OLS would bend hard)."""
    vals = [100 + 3 * i for i in range(15)]
    vals[7] = 100000
    df = spark.createDataFrame(_days(vals), "day date, x long")
    row = theil_sen_trend(df, "day", "x").collect()[0]
    assert row.slope_per_day == pytest.approx(3.0, abs=0.5)


def test_theil_sen_brute_force(spark):
    import random

    rng = random.Random(3)
    vals = [rng.randint(0, 500) for _ in range(10)]
    df = spark.createDataFrame(_days(vals), "day date, x long")
    row = theil_sen_trend(df, "day", "x").collect()[0]
    # brute uses day indices 0..9; the operator uses epoch days — slopes
    # are shift-invariant, intercept is not, so compare slope and the
    # PREDICTED value at the first day instead of the raw intercept
    slope, b = _brute_theil_sen(vals)
    assert row.slope_per_day == pytest.approx(slope)
    d0 = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    assert row.intercept + row.slope_per_day * d0 == pytest.approx(
        b, abs=1e-6
    )


def test_theil_sen_single_day_degenerate(spark):
    df = spark.createDataFrame(_days([42]), "day date, x long")
    row = theil_sen_trend(df, "day", "x").collect()[0]
    assert row.n_days == 1
    assert row.slope_per_day is None


def test_dow_integer_anchor(spark):
    """2024-01-01 was a Monday -> dow 0; 2024-01-07 a Sunday -> dow 6."""
    rows = [
        ("a", datetime.datetime(2024, 1, 1, 12)),
        ("a", datetime.datetime(2024, 1, 7, 12)),
        ("a", datetime.datetime(2024, 1, 8, 12)),  # Monday again
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.dow: r.n for r in dow_seasonality(df).collect()}
    assert out == {0: 2, 6: 1}


def test_dow_flat_week_index_one(spark):
    rows = [
        ("t", datetime.datetime(2024, 1, 1 + d, 9)) for d in range(7)
    ] * 3
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = dow_seasonality(df).collect()
    assert len(out) == 7
    for r in out:
        assert r.seasonality_index == pytest.approx(1.0)
        assert r.share == pytest.approx(1 / 7)


def test_dow_type_isolation(spark):
    rows = [("a", datetime.datetime(2024, 1, 1, 9))] * 5 + [
        ("b", datetime.datetime(2024, 1, 2, 9))
    ] * 3
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {(r.event_type, r.dow): r for r in dow_seasonality(df).collect()}
    assert out[("a", 0)].seasonality_index == pytest.approx(7.0)
    assert out[("b", 1)].share == pytest.approx(1.0)
