"""Wave 111: Pettitt rank-based changepoint — brute-force O(n^2)
cross-checks (including heavy ties), the midrank-identity collapse,
earliest-day argmax tie-break, and the degenerate-series contracts."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    pettitt_changepoint,
)


def _daily(spark, xs):
    base = datetime.date(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=i), int(x)) for i, x in enumerate(xs)
    ]
    return spark.createDataFrame(rows, "day date, x long")


def _brute(xs):
    x = np.asarray(xs, dtype="int64")
    n = len(x)
    u = [
        int(sum(np.sign(x[i] - x[j]) for i in range(t) for j in range(t, n)))
        for t in range(1, n)
    ]
    k = max(abs(v) for v in u)
    t_star = min(t for t, v in enumerate(u, 1) if abs(v) == k)
    return k, u[t_star - 1], t_star


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_pettitt_matches_bruteforce_with_ties(spark, seed):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, 6, size=int(rng.integers(5, 16))).tolist()
    k, u, t_star = _brute(xs)
    got = pettitt_changepoint(_daily(spark, xs)).collect()[0]
    assert got.n_days == len(xs)
    assert got.k_stat == k
    assert got.u_at_change == u
    assert got.change_day == datetime.date(2024, 1, 1) + datetime.timedelta(
        days=t_star - 1
    )


def test_pettitt_detects_obvious_shift(spark):
    xs = [10, 11, 10, 12, 11, 50, 52, 49, 51, 50]
    got = pettitt_changepoint(_daily(spark, xs)).collect()[0]
    # clean level shift after day 5: U_5 = -(5 * 5) (every early-late
    # pair signs -1), the theoretical maximum for a 5|5 split
    assert got.k_stat == 25
    assert got.change_day == datetime.date(2024, 1, 5)
    # 2*exp(-6*25^2/(10^3+10^2)) = 2*exp(-75/22) -> 0.066143 at 6 dp —
    # the small-n ceiling of the approximation; the shift is maximal
    assert got.p_approx == pytest.approx(0.066143, abs=1e-6)


def test_pettitt_flat_series_k_zero(spark):
    got = pettitt_changepoint(_daily(spark, [7, 7, 7, 7])).collect()[0]
    assert got.k_stat == 0
    # argmax ties at 0 resolve to the EARLIEST day
    assert got.change_day == datetime.date(2024, 1, 1)
    assert got.p_approx == 1.0


def test_pettitt_degenerate_series_null(spark):
    one = pettitt_changepoint(_daily(spark, [5])).collect()[0]
    assert one.n_days == 1
    assert one.k_stat is None and one.change_day is None
    empty = pettitt_changepoint(
        spark.createDataFrame([], "day date, x long")
    ).collect()[0]
    assert empty.n_days == 0 and empty.k_stat is None
