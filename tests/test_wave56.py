"""Wave 56: Mann-Kendall trend test (exact S + tie-corrected variance)
and stratified ATE (subclassification) — brute-force goldens, tie
corrections, off-support strata."""

from __future__ import annotations

import datetime
import itertools
import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    mann_kendall_trend,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    stratified_ate,
)


def _days(vals):
    d0 = datetime.date(2024, 1, 1)
    return [(d0 + datetime.timedelta(days=i), v) for i, v in enumerate(vals)]


def _brute_mk(vals):
    s = sum(
        (1 if b > a else -1 if b < a else 0)
        for a, b in itertools.combinations(vals, 2)
    )
    n = len(vals)
    from collections import Counter

    tie = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(vals).values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie
    if var18 <= 0:
        return s, var18, None
    sd = math.sqrt(var18 / 18.0)
    z = (s - 1) / sd if s > 0 else (s + 1) / sd if s < 0 else 0.0
    return s, var18, z


def test_mk_strictly_increasing(spark):
    vals = list(range(1, 11))
    df = spark.createDataFrame(_days(vals), "day date, x long")
    row = mann_kendall_trend(df, "day", "x").collect()[0]
    assert row.s_stat == 45  # all C(10,2) pairs concordant
    s, var18, z = _brute_mk(vals)
    assert row.var_s_x18 == var18
    assert row.z == pytest.approx(z)
    assert row.z > 2.5  # clearly significant upward trend


def test_mk_brute_force_with_ties(spark):
    vals = [5, 3, 3, 8, 1, 8, 8, 2, 9, 4]
    df = spark.createDataFrame(_days(vals), "day date, x long")
    row = mann_kendall_trend(df, "day", "x").collect()[0]
    s, var18, z = _brute_mk(vals)
    assert row.s_stat == s
    assert row.var_s_x18 == var18
    assert row.z == pytest.approx(z)


def test_mk_flat_series_null_z(spark):
    df = spark.createDataFrame(_days([7] * 6), "day date, x long")
    row = mann_kendall_trend(df, "day", "x").collect()[0]
    assert row.s_stat == 0
    assert row.var_s_x18 == 0
    assert row.z is None


def test_mk_zero_s_nonzero_variance(spark):
    """Perfectly balanced up/down: S = 0 but variance > 0 -> z = 0.0."""
    vals = [1, 2, 1, 2, 1, 2]
    df = spark.createDataFrame(_days(vals), "day date, x long")
    row = mann_kendall_trend(df, "day", "x").collect()[0]
    s, var18, z = _brute_mk(vals)
    assert row.s_stat == s
    if s == 0:
        assert row.z == pytest.approx(0.0)
    else:
        assert row.z == pytest.approx(z)


def test_ate_golden_two_strata(spark):
    """Stratum A: treated mean 100, control mean 60 -> diff 40 (n=4).
    Stratum B: treated mean 10, control mean 30 -> diff -20 (n=4).
    Weights 0.5 each -> consumer ATE = 10."""
    rows = [
        ("A", True, 90), ("A", True, 110), ("A", False, 50), ("A", False, 70),
        ("B", True, 10), ("B", True, 10), ("B", False, 20), ("B", False, 40),
    ]
    df = spark.createDataFrame(rows, "s string, t boolean, y long")
    out = {r.s: r for r in stratified_ate(df, "s", "t", "y").collect()}
    assert out["A"].diff == pytest.approx(40.0)
    assert out["B"].diff == pytest.approx(-20.0)
    assert out["A"].weight == pytest.approx(0.5)
    ate = sum(r.weight * r.diff for r in out.values())
    assert ate == pytest.approx(10.0)


def test_ate_off_support_stratum_nulls(spark):
    """A stratum with only treated rows surfaces with NULL control mean
    and NULL diff instead of being dropped."""
    rows = [("A", True, 5), ("A", True, 7), ("B", True, 1), ("B", False, 2)]
    df = spark.createDataFrame(rows, "s string, t boolean, y long")
    out = {r.s: r for r in stratified_ate(df, "s", "t", "y").collect()}
    assert out["A"].mean_control is None
    assert out["A"].diff is None
    assert out["A"].n_control == 0
    assert out["B"].diff == pytest.approx(-1.0)


def test_ate_partition_independence(spark):
    rows = [
        (f"s{i % 3}", i % 2 == 0, i * 10) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "s string, t boolean, y long")
    a = {
        r.s: (r.n, r.n_treated, r.diff, r.weight)
        for r in stratified_ate(df, "s", "t", "y").collect()
    }
    b = {
        r.s: (r.n, r.n_treated, r.diff, r.weight)
        for r in stratified_ate(df.repartition(16), "s", "t", "y").collect()
    }
    assert a == b
