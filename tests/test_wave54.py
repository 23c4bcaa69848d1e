"""Wave 54: CUSUM level-shift detection (integer-scaled prefix statistic)
and Benford first-digit audit (string-digit extraction, shared integer
expected table) — closed-form goldens and edge cases."""

from __future__ import annotations

import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    cusum_changepoint,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    benford_expected_millionths,
    benford_first_digit,
)


# ---------------------------------------------------------------------------
# cusum_changepoint
# ---------------------------------------------------------------------------

def _days(vals):
    import datetime

    d0 = datetime.date(2024, 1, 1)
    return [
        (d0 + datetime.timedelta(days=i), v) for i, v in enumerate(vals)
    ]


def test_cusum_level_shift_peak_at_break(spark):
    """10 days at 100 then 10 days at 200: |C_k| peaks exactly at the
    last pre-shift day (k=10)."""
    vals = [100] * 10 + [200] * 10
    df = spark.createDataFrame(_days(vals), "day date, x long")
    rows = cusum_changepoint(df, "day", "x").orderBy("day").collect()
    peaks = [i for i, r in enumerate(rows) if r.is_peak]
    assert peaks == [9]  # 0-indexed day 10
    # closed form at k=10: C_k*n = n*P_k − k*S = 20*1000 − 10*3000 = −10000
    assert rows[9].cusum_n_scaled == -10000


def test_cusum_matches_brute_force(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    n, s = len(vals), sum(vals)
    df = spark.createDataFrame(_days(vals), "day date, x long")
    rows = cusum_changepoint(df, "day", "x").orderBy("day").collect()
    prefix = 0
    q = sum(v * v for v in vals)
    for k, (v, r) in enumerate(zip(vals, rows), start=1):
        prefix += v
        expect = n * prefix - k * s
        assert r.cusum_n_scaled == expect
        var_n2 = n * q - s * s
        assert r.cusum_z == pytest.approx(
            expect / math.sqrt(var_n2 * n)
        )


def test_cusum_flat_series_null_z_all_peak(spark):
    df = spark.createDataFrame(_days([7, 7, 7, 7]), "day date, x long")
    rows = cusum_changepoint(df, "day", "x").collect()
    assert all(r.cusum_z is None for r in rows)
    assert all(r.cusum_n_scaled == 0 for r in rows)
    assert all(r.is_peak for r in rows)  # max |C| = 0 ties everywhere


def test_cusum_partition_independence(spark):
    vals = [10, 20, 5, 40, 8, 30]
    df1 = spark.createDataFrame(_days(vals), "day date, x long")
    out1 = {
        r.day: (r.cusum_n_scaled, r.is_peak)
        for r in cusum_changepoint(df1, "day", "x").collect()
    }
    out8 = {
        r.day: (r.cusum_n_scaled, r.is_peak)
        for r in cusum_changepoint(
            df1.repartition(8), "day", "x"
        ).collect()
    }
    assert out1 == out8


# ---------------------------------------------------------------------------
# benford_first_digit
# ---------------------------------------------------------------------------

def test_benford_expected_table():
    exp = benford_expected_millionths()
    assert len(exp) == 9
    assert exp[0] == 301030  # log10(2)
    assert exp[8] == 45757  # log10(10/9)
    # a proper probability table (rounding residue < 9 millionths)
    assert abs(sum(exp) - 1_000_000) < 9


def test_benford_digit_extraction_and_counts(spark):
    # amounts: first digits 1,1,2,9 — zero/negative excluded
    df = spark.createDataFrame(
        [(100,), (1999,), (25,), (900000,), (0,), (-5,)], "cents long"
    )
    rows = {r.digit: r for r in benford_first_digit(df, "cents").collect()}
    assert {d: r.n for d, r in rows.items()} == {1: 2, 2: 1, 9: 1}
    assert rows[1].observed_p == pytest.approx(0.5)
    assert rows[1].expected_p == pytest.approx(0.301030)


def test_benford_chi2_term_closed_form(spark):
    """2-digit toy: observed 1/2 each, so each chi2 term must equal the
    textbook t*(o_p − e_p)^2 / e_p with t = 2."""
    exp = benford_expected_millionths()
    toy = spark.createDataFrame([(100,), (200,)], "cents long")
    out = {r.digit: r for r in benford_first_digit(toy, "cents").collect()}
    # observed 1/2 each; chi2 term = (0.5−e)^2/e * t with t=2
    for d in (1, 2):
        e = exp[d - 1] / 1_000_000
        assert out[d].chi2_term == pytest.approx(
            2 * (0.5 - e) ** 2 / e, rel=1e-9
        )


def test_benford_partition_independence(spark):
    vals = [(v,) for v in range(1, 500)]
    df = spark.createDataFrame(vals, "cents long")
    a = {
        r.digit: (r.n, r.chi2_term)
        for r in benford_first_digit(df, "cents").collect()
    }
    b = {
        r.digit: (r.n, r.chi2_term)
        for r in benford_first_digit(df.repartition(16), "cents").collect()
    }
    assert a == b
    assert sum(n for n, _ in a.values()) == 499
