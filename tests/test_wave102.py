"""Wave 102: Holt-Winters weekly additive smoothing — hand-walked
integer-state golden through the queries() registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, day_values):
    ts = datetime.datetime
    rows = [
        (i, ts(y, m, d, 12), 100 + i, "purchase", v, "{}")
        for i, ((y, m, d), v) in enumerate(day_values)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_holt_winters_golden(spark, tmp_path):
    # Mon 2025-01-06 x=100c, Tue 01-07 x=200c, Mon 01-13 x=300c
    # hand-walked integer-millis state (alpha=1/5, beta=gamma=1/10):
    #   r1 (dow0, first): l=100000 b=0 s0=0
    #   r2 (dow1): l=120000 b=2000 s1=8000
    #   r3 (dow0): l=157600 b=5560 s0=14240
    sf = _sf(
        spark,
        tmp_path,
        [((2025, 1, 6), 1.0), ((2025, 1, 7), 2.0), ((2025, 1, 13), 3.0)],
    )
    r = entry_mod.queries()["holt_winters_daily_revenue"](
        spark, sf
    ).collect()[0]
    assert (r.n_days, r.level_millis, r.trend_millis) == (3, 157600, 5560)
    assert r.season_amplitude_millis == 14240
    assert r.level == pytest.approx(157.6)
    assert r.trend == pytest.approx(5.56)
    # last day is Monday (dow 0) -> forecast uses Tuesday's slot s1=8000
    assert r.forecast_next == pytest.approx(
        (157600 + 5560 + 8000) / 1000.0
    )


def test_holt_winters_missing_days_keep_phase(spark, tmp_path):
    # two Mondays a week apart: the seasonal slot is indexed by the
    # CALENDAR dow, so the gap does not shift phase — both hit slot 0
    sf = _sf(
        spark, tmp_path, [((2025, 1, 6), 1.0), ((2025, 1, 13), 1.0)]
    )
    r = entry_mod.queries()["holt_winters_daily_revenue"](
        spark, sf
    ).collect()[0]
    # r1: l=100000 b=0 s0=0; r2 (dow0): lt=rnd(100000+400000,5)=100000,
    # bt=rnd(0+0,10)=0, s0=rnd(0+0,10)=0 -> flat series stays flat
    assert (r.level_millis, r.trend_millis) == (100000, 0)
    assert r.season_amplitude_millis == 0
    assert r.forecast_next == pytest.approx(100.0)


def test_holt_winters_empty_one_row(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    r = entry_mod.queries()["holt_winters_daily_revenue"](
        spark, sf
    ).collect()[0]
    assert r.n_days == 0
    assert r.level_millis is None and r.forecast_next is None


def test_holt_winters_pre_1970_dow_pmod(spark, tmp_path):
    """r9 ADVICE regression: pre-1970 days have a negative sign-following
    (epoch_day+3) % 7, which under the old code fell through the slot
    when-chain to NULL and was silently decayed to 0 by the F.aggregate
    non-nullable init. pmod keeps the walk finite on both engines."""
    # 1969-12-18 and 1969-12-25 are both Thursdays (dow 3, Monday=0):
    # epoch_day+3 = -11 and -4, pmod 7 -> 3 on both.
    sf = _sf(
        spark,
        tmp_path,
        [((1969, 12, 18), 1.0), ((1969, 12, 25), 2.0)],
    )
    r = entry_mod.queries()["holt_winters_daily_revenue"](
        spark, sf
    ).collect()[0]
    # hand walk: r1 (first) l=100000 b=0 s3=0; r2 sprev=s3=0,
    # lt=rnd((200000-0+4*100000)/5)=120000, bt=rnd(20000/10)=2000,
    # s3=rnd(80000/10)=8000. Under the old bug lt decayed to 0 and
    # bt came out -10000.
    assert (r.n_days, r.level_millis, r.trend_millis) == (2, 120000, 2000)
    assert r.season_amplitude_millis == 8000
    # last dow 3 -> forecast uses slot 4 (still 0)
    assert r.forecast_next == pytest.approx(122.0)
    # cross-engine: the SQL twin's ((x%7)+7)%7 walks identical state
    import duckdb
    import glob as _glob

    con = duckdb.connect()
    files = _glob.glob(os.path.join(sf, "events.parquet", "*.parquet"))
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        + repr(files)
        + ")"
    )
    o = con.execute(entry_mod.oracle_sql()["holt_winters_daily_revenue"]).fetchone()
    assert o[0] == 2 and o[1] == 120000 and o[2] == 2000


def test_daily_rollups_exclude_null_ts(spark, tmp_path):
    """r9 ADVICE regression: a NULL ts must not enter the day grid of
    the wave-98/102 daily rollups (NULL day ordering diverges across
    engines: Spark NULLS FIRST vs DuckDB NULLS LAST)."""
    import datetime as _dt

    rows = [
        (0, _dt.datetime(2025, 1, 6, 12), 100, "purchase", 1.0, "{}"),
        (1, None, 101, "purchase", 99.0, "{}"),
        (2, _dt.datetime(2025, 1, 7, 12), 102, "purchase", 2.0, "{}"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    q = entry_mod.queries()
    ph = q["page_hinkley_daily_revenue"](spark, sf).collect()
    assert len(ph) == 2 and all(r.day is not None for r in ph)
    hl = q["holt_linear_daily_revenue"](spark, sf).collect()[0]
    assert hl.n_days == 2
    hw = q["holt_winters_daily_revenue"](spark, sf).collect()[0]
    assert hw.n_days == 2
