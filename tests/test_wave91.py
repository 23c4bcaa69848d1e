"""Wave 91: two-period rate ratio and Wald-Wolfowitz runs test —
closed-form references on constructed event streams."""

from __future__ import annotations

import datetime
import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    rate_ratio_two_periods,
    runs_test_daily,
)

T0 = datetime.datetime(2024, 1, 1, 12)


def _events(spark, day_counts: dict[int, int], values: dict[int, float] | None = None):
    rows = []
    eid = 0
    for day, cnt in day_counts.items():
        for i in range(cnt):
            rows.append(
                (
                    eid,
                    T0 + datetime.timedelta(days=day, minutes=i),
                    1,
                    "purchase",
                    (values or {}).get(day, 10.0),
                )
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_rate_ratio_reference(spark):
    # days 0..9: 3/day in first half (0..4), 6/day in second (5..9)
    counts = {d: (3 if d <= 4 else 6) for d in range(10)}
    df = _events(spark, counts)
    row = rate_ratio_two_periods(df).collect()[0]
    # lo=0 hi=9 -> mid=(0+9-1)/2=4; e1=5 days, e2=5 days
    assert (row.c1, row.e1_days, row.c2, row.e2_days) == (15, 5, 30, 5)
    r1, r2 = 15 / 5, 30 / 5
    se = math.sqrt(15 / 25 + 30 / 25)
    assert row.rate1 == pytest.approx(r1)
    assert row.rate_ratio == pytest.approx(r1 / r2)
    assert row.z_rate == pytest.approx((r1 - r2) / se, abs=1e-12)


def test_rate_ratio_flat_is_zero_z(spark):
    counts = {d: 4 for d in range(8)}
    row = rate_ratio_two_periods(_events(spark, counts)).collect()[0]
    assert row.z_rate == pytest.approx(0.0)
    assert row.rate_ratio == pytest.approx(1.0)


def _ref_runs(signs):
    n1 = sum(signs)
    n2 = len(signs) - n1
    r = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n = n1 + n2
    e = 2 * n1 * n2 / n + 1
    v = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)) / (n * n * (n - 1))
    return r, (r - e) / math.sqrt(v)


def test_runs_reference_alternating(spark):
    # alternating high/low days -> maximal runs, strongly positive z
    vals = {d: (100.0 if d % 2 == 0 else 1.0) for d in range(12)}
    counts = {d: 1 for d in range(12)}
    row = runs_test_daily(_events(spark, counts, vals)).collect()[0]
    # median falls between values; LOWER median = a low day -> the 6 low
    # days tie the median and are EXCLUDED; remaining 6 high days form 1 run
    assert row.n_above == 6 and row.n_below == 0
    assert row.z_runs is None  # one-sided: no variance basis


def test_runs_reference_mixed(spark):
    # values: H H L L H L (days 0..5); lower median = L ties excluded
    pattern = [300.0, 300.0, 1.0, 1.0, 300.0, 1.0]
    vals = {d: v for d, v in enumerate(pattern)}
    counts = {d: 1 for d in range(6)}
    row = runs_test_daily(_events(spark, counts, vals)).collect()[0]
    # daily cents: 30000 x3, 100 x3 -> sorted [100,100,100,30000,30000,30000]
    # n=6, lower-median rank ceil(6/2)=3 -> median=100; the three 100-days
    # tie and are excluded; remaining 3 high days (0,1,4): runs = 2? they
    # sit at days 0,1,4 -> signs all 'up': 1 run, one-sided -> z NULL
    assert row.n_above == 3 and row.n_below == 0 and row.z_runs is None


def test_runs_two_sided_z(spark):
    # 13 days, strictly increasing values -> low block then high block:
    # 2 runs, strongly negative z (clumped)
    vals = {d: float(d + 1) for d in range(13)}
    counts = {d: 1 for d in range(13)}
    row = runs_test_daily(_events(spark, counts, vals)).collect()[0]
    # median = 7th value (=7.0) excluded; 6 below, 6 above, 2 runs
    assert (row.n_above, row.n_below, row.n_runs) == (6, 6, 2)
    r, z = _ref_runs([0] * 6 + [1] * 6)
    assert row.n_runs == r
    assert row.z_runs == pytest.approx(z, abs=1e-12)
    assert row.z_runs < -2
