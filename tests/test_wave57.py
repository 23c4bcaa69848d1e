"""Wave 57: lag-k autocorrelation (integer-exact centered products,
calendar-gap-correct) and Cochran-Mantel-Haenszel per-stratum terms —
brute-force goldens and degenerate-stratum handling."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    acf_daily,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    cmh_terms,
)


def _days(vals, gaps=None):
    d0 = datetime.date(2024, 1, 1)
    days = []
    offset = 0
    for i, v in enumerate(vals):
        if gaps and i in gaps:
            offset += gaps[i]
        days.append((d0 + datetime.timedelta(days=i + offset), v))
    return days


def _brute_acf(series, k):
    """series: dict day_index -> value (may have gaps)."""
    n = len(series)
    mean = sum(series.values()) / n
    den = sum((v - mean) ** 2 for v in series.values())
    num = sum(
        (series[d] - mean) * (series[d + k] - mean)
        for d in series
        if d + k in series
    )
    return num / den if den > 0 else None


def test_acf_alternating_series(spark):
    """Perfect alternation: acf(1) strongly negative, acf(2) positive."""
    vals = [10, 20, 10, 20, 10, 20, 10, 20]
    df = spark.createDataFrame(_days(vals), "day date, x long")
    out = {r.lag: r for r in acf_daily(df, "day", "x", max_lag=3).collect()}
    series = {i: v for i, v in enumerate(vals)}
    for k in (1, 2, 3):
        assert out[k].acf == pytest.approx(_brute_acf(series, k))
    assert out[1].acf < -0.5
    assert out[2].acf > 0.5


def test_acf_brute_force_random(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    df = spark.createDataFrame(_days(vals), "day date, x long")
    out = {r.lag: r.acf for r in acf_daily(df, "day", "x", max_lag=5).collect()}
    series = {i: v for i, v in enumerate(vals)}
    for k in range(1, 6):
        assert out[k] == pytest.approx(_brute_acf(series, k))


def test_acf_calendar_gap_semantics(spark):
    """A 3-day hole: lag-1 pairs only exist where days are truly
    adjacent — row adjacency across the hole must NOT pair."""
    rows = _days([5, 7, 9, 11], gaps={2: 3})  # days 0,1,5,6
    df = spark.createDataFrame(rows, "day date, x long")
    out = {r.lag: r for r in acf_daily(df, "day", "x", max_lag=2).collect()}
    assert out[1].n_pairs == 2  # (0,1) and (5,6) only
    series = {0: 5, 1: 7, 5: 9, 6: 11}
    assert out[1].acf == pytest.approx(_brute_acf(series, 1))
    assert out[2].n_pairs == 0
    assert out[2].acf is None


def test_acf_flat_series_null(spark):
    df = spark.createDataFrame(_days([4, 4, 4, 4]), "day date, x long")
    out = acf_daily(df, "day", "x", max_lag=2).collect()
    assert all(r.acf is None for r in out)


def test_cmh_golden_stratum(spark):
    """One stratum, 2x2 = [[3, 1], [1, 3]]: a=3, r1=4, c1=4, n=8,
    E[a] = 2, Var[a] = 4*4*4*4/(64*7) = 4/7."""
    rows = (
        [("s", True, True)] * 3
        + [("s", True, False)]
        + [("s", False, True)]
        + [("s", False, False)] * 3
    )
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    row = cmh_terms(df, "s", "e", "o").collect()[0]
    assert row.a == 3
    assert row.expected_a == pytest.approx(2.0)
    assert row.var_a == pytest.approx(4 / 7)


def test_cmh_degenerate_margin_null_var(spark):
    """All exposed: r2 = 0 -> var NULL, expected still defined."""
    rows = [("s", True, True)] * 2 + [("s", True, False)] * 2
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    row = cmh_terms(df, "s", "e", "o").collect()[0]
    assert row.var_a is None
    assert row.expected_a == pytest.approx(2.0)


def test_cmh_consumer_statistic_simpsons(spark):
    """Two strata engineered so the pooled 2x2 reverses the per-stratum
    association (Simpson); CMH over per-stratum terms still detects the
    consistent within-stratum effect direction."""
    # stratum A: exposure helps (a=8 of r1=10 vs 2 of 10)
    rows = (
        [("A", True, True)] * 8 + [("A", True, False)] * 2
        + [("A", False, True)] * 2 + [("A", False, False)] * 8
        # stratum B: same direction, different base rate
        + [("B", True, True)] * 5 + [("B", True, False)] * 5
        + [("B", False, True)] * 1 + [("B", False, False)] * 9
    )
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    terms = cmh_terms(df, "s", "e", "o").collect()
    num = abs(sum(r.a - r.expected_a for r in terms)) - 0.5
    cmh = num * num / sum(r.var_a for r in terms)
    assert cmh > 3.84  # significant at 5% (chi2_1)


def test_cmh_partition_independence(spark):
    rows = [
        (f"s{i % 3}", i % 2 == 0, i % 5 != 0) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    a = {
        r.s: (r.n, r.a, r.expected_a, r.var_a)
        for r in cmh_terms(df, "s", "e", "o").collect()
    }
    b = {
        r.s: (r.n, r.a, r.expected_a, r.var_a)
        for r in cmh_terms(df.repartition(16), "s", "e", "o").collect()
    }
    assert a == b
