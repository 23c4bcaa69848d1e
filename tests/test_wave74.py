"""Wave 74: RFM segmentation (exact tiles, inverted recency) and
seasonal-naive backtest — brute-force tiles, seasonality detection."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    rfm_scores,
    seasonal_naive_backtest,
)


def _ev(user, day, value):
    return (
        user,
        "purchase",
        datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day),
        float(value),
    )


SCHEMA = "user_id string, event_type string, ts timestamp, value double"


def test_rfm_extremes(spark):
    """20 users: user i purchases on day i, i+1 times, spending 10*i.
    The best user (most recent, most frequent, biggest spender) must be
    555; the worst must be 111."""
    rows = []
    for i in range(20):
        for k in range(i + 1):
            rows.append(_ev(f"u{i:02d}", i, 10.0 * (i + 1) / (i + 1)))
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.user: r for r in rfm_scores(df).collect()}
    best = out["u19"]
    worst = out["u00"]
    assert best.rfm_segment == 555
    assert worst.rfm_segment == 111
    assert best.recency_days == 0
    assert worst.frequency == 1


def test_rfm_tiles_match_brute_force(spark):
    import random

    rng = random.Random(17)
    rows = []
    users = [f"u{i:03d}" for i in range(50)]
    for u in users:
        for _ in range(rng.randint(1, 6)):
            rows.append(_ev(u, rng.randint(0, 29), rng.uniform(1, 500)))
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.user: r for r in rfm_scores(df).collect()}
    n = len(users)
    # brute force from the operator's own raw dims (already verified by
    # construction) — checks only the rank->tile arithmetic
    for dim, score_col, invert in (
        ("recency_days", "r_score", True),
        ("frequency", "f_score", False),
        ("monetary_cents", "m_score", False),
    ):
        order = sorted(out.values(), key=lambda r: (getattr(r, dim), r.user))
        for rank, r in enumerate(order, start=1):
            tile = (5 * (rank - 1)) // n
            want = 5 - tile if invert else tile + 1
            assert getattr(r, score_col) == want, (dim, r.user)


def test_rfm_scores_in_range_and_segment_consistent(spark):
    rows = [_ev(f"u{i}", i % 9, 5.0 + i) for i in range(40)]
    df = spark.createDataFrame(rows, SCHEMA)
    for r in rfm_scores(df).collect():
        assert 1 <= r.r_score <= 5
        assert 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
        assert r.rfm_segment == r.r_score * 100 + r.f_score * 10 + r.m_score


def _daily(spark, vals):
    d0 = datetime.date(2024, 1, 1)
    rows = [
        (d0 + datetime.timedelta(days=i), v) for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "day date, x long")


def test_seasonal_naive_perfect_weekly_cycle(spark):
    vals = [10, 20, 30, 40, 50, 60, 70] * 3
    row = seasonal_naive_backtest(_daily(spark, vals), season_days=7).collect()[0]
    assert row.n_forecasts == 14
    assert row.total_abs_err == 0
    assert row.mae == pytest.approx(0.0)
    assert row.wape == pytest.approx(0.0)


def test_seasonal_naive_wrong_season_has_error(spark):
    vals = [10, 20, 30, 40, 50, 60, 70] * 3
    row = seasonal_naive_backtest(_daily(spark, vals), season_days=5).collect()[0]
    assert row.total_abs_err > 0


def test_seasonal_naive_golden(spark):
    """Values 0..9 with season 7: forecasts for days 7,8,9 predict 0,1,2
    -> abs errors 7 each, total 21, mae 7."""
    row = seasonal_naive_backtest(
        _daily(spark, list(range(10))), season_days=7
    ).collect()[0]
    assert row.n_forecasts == 3
    assert row.total_abs_err == 21
    assert row.mae == pytest.approx(7.0)


def test_seasonal_naive_gap_skips_forecast(spark):
    """Remove day 0: day 7 has no lag-7 ancestor -> 2 forecasts only."""
    d0 = datetime.date(2024, 1, 1)
    rows = [
        (d0 + datetime.timedelta(days=i), i * 10)
        for i in range(10)
        if i != 0
    ]
    df = spark.createDataFrame(rows, "day date, x long")
    row = seasonal_naive_backtest(df, season_days=7).collect()[0]
    assert row.n_forecasts == 2  # days 8 and 9 only
