"""Wave 96: Kaplan-Meier time-to-first-purchase curve + A/A log-rank
bucket test — hand-computed goldens through the queries() registry on a
synthetic slice."""

from __future__ import annotations

import datetime
import math
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path):
    ts = datetime.datetime
    # clock starts at each user's FIRST event; event = first purchase;
    # never-buyers censored at last activity
    rows = [
        # u101 (odd -> bucket rest): purchase on day 0 -> t=0 event
        (1, ts(2025, 1, 1, 10), 101, "purchase", 2.0, "{}"),
        # u102 (even -> cohort): first 01-01, purchase 01-03 -> t=2
        (2, ts(2025, 1, 1, 9), 102, "click", 1.0, "{}"),
        (3, ts(2025, 1, 3, 9), 102, "purchase", 3.0, "{}"),
        # u103 (odd): first 01-01, purchase 01-03 -> t=2
        (4, ts(2025, 1, 1, 8), 103, "click", 1.0, "{}"),
        (5, ts(2025, 1, 3, 8), 103, "purchase", 4.0, "{}"),
        # u104 (even): clicks only 01-01..01-20 -> censored t=19
        (6, ts(2025, 1, 1, 7), 104, "click", 1.0, "{}"),
        (7, ts(2025, 1, 20, 7), 104, "view", 1.0, "{}"),
        # u105 (odd): first 01-05, purchase 02-01 -> t=27 event
        (8, ts(2025, 1, 5, 6), 105, "click", 1.0, "{}"),
        (9, ts(2025, 2, 1, 6), 105, "purchase", 5.0, "{}"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_kaplan_meier_golden(spark, tmp_path):
    sf = _sf(spark, tmp_path)
    out = {
        r.t_day: r
        for r in entry_mod.queries()["kaplan_meier_conversion"](
            spark, sf
        ).collect()
    }
    # event times: t=0 (u101 of 5 at risk), t=2 (u102+u103 of 4),
    # t=27 (u105, last at risk -> survival hits exactly 0)
    assert sorted(out) == [0, 2, 27]
    t0, t2, t27 = out[0], out[2], out[27]
    assert (t0.n_risk, t0.d_event, t0.c_censored) == (5, 1, 0)
    assert (t2.n_risk, t2.d_event, t2.c_censored) == (4, 2, 0)
    assert (t27.n_risk, t27.d_event, t27.c_censored) == (1, 1, 0)
    assert t0.log_survival == pytest.approx(math.log(0.8), abs=1e-5)
    assert t2.log_survival == pytest.approx(
        math.log(0.8) + math.log(0.5), abs=1e-5
    )
    assert not t0.survival_zero and not t2.survival_zero
    # d == n at the last step: survival is exactly 0 from here
    assert t27.log_survival is None and t27.survival_zero


def test_logrank_golden(spark, tmp_path):
    sf = _sf(spark, tmp_path)
    row = entry_mod.queries()["logrank_ab_conversion"](
        spark, sf
    ).collect()[0]
    # even bucket (cohort): u102, u104; odd (rest): u101, u103, u105
    assert (row.n_users_cohort, row.n_users_rest) == (2, 3)
    # t=27 has pooled risk set n=1 -> skipped; informative times t=0, t=2
    assert (row.n_event_times, row.o1) == (2, 1)
    # t=0: d=1, n1=2, n=5 -> e1 = 0.4, v = 1*2*3*4/(25*4) = 0.24
    # t=2: d=2, n1=2, n0=2, n=4 -> e1 = 1.0, v = 16/48 = 1/3
    assert row.e1 == pytest.approx(1.4, abs=1e-5)
    assert row.v1 == pytest.approx(0.24 + 1 / 3, abs=1e-5)
    assert row.logrank_chi2 == pytest.approx(
        (1 - 1.4) ** 2 / (0.24 + 1 / 3), abs=1e-4
    )


def test_kaplan_meier_no_conversions(spark, tmp_path):
    # nobody converts -> no event times -> empty curve on both engines
    ts = datetime.datetime
    rows = [
        (1, ts(2025, 1, 1), 1, "click", 1.0, "{}"),
        (2, ts(2025, 1, 5), 2, "view", 1.0, "{}"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    assert (
        entry_mod.queries()["kaplan_meier_conversion"](spark, sf).count()
        == 0
    )


def test_logrank_empty_keeps_one_row(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    rows = entry_mod.queries()["logrank_ab_conversion"](
        spark, sf
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_users_cohort, r.n_users_rest, r.n_event_times, r.o1) == (
        0,
        0,
        0,
        0,
    )
    assert r.e1 is None and r.v1 is None and r.logrank_chi2 is None
