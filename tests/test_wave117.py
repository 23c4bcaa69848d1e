"""Wave 117: decile shift function + exact trimmed means — hand
goldens through the queries() registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, rows):
    ts_before = datetime.datetime(2024, 1, 5, 12)
    ts_after = datetime.datetime(2024, 2, 5, 12)
    data = [
        (i, ts_after if after else ts_before, 100 + i, "click", v, "{}")
        for i, (v, after) in enumerate(rows)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_decile_shift_pure_location(spark, tmp_path):
    # right = left + 2.0 exactly: every decile shifts by exactly 2.0
    left = [(float(v), False) for v in range(1, 11)]
    right = [(float(v) + 2.0, True) for v in range(1, 11)]
    sf = _sf(spark, tmp_path, left + right)
    q = entry_mod.queries()
    rows = {r.decile: r for r in q["decile_shift_value_drift"](spark, sf).collect()}
    assert set(rows) == set(range(1, 10))
    for k in range(1, 10):
        assert rows[k].q_left == pytest.approx(float(k))
        assert rows[k].q_right == pytest.approx(float(k) + 2.0)
        assert rows[k].shift == pytest.approx(2.0)


def test_decile_shift_empty_side_nulls(spark, tmp_path):
    sf = _sf(spark, tmp_path, [(1.0, False), (2.0, False)])
    q = entry_mod.queries()
    rows = q["decile_shift_value_drift"](spark, sf).collect()
    assert all(r.q_right is None and r.shift is None for r in rows)
    assert all(r.q_left is not None for r in rows)


def test_trimmed_mean_outlier_immune(spark, tmp_path):
    # left = {1..9, 1000}: the 10% trim drops exactly the min and the
    # outlier max -> trimmed mean (2+..+9)/8 = 5.5, same as {1..10}
    left = [(float(v), False) for v in range(1, 10)] + [(1000.0, False)]
    right = [(float(v) + 2.0, True) for v in range(1, 11)]
    sf = _sf(spark, tmp_path, left + right)
    q = entry_mod.queries()
    r = q["trimmed_mean_value_drift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right) == (10, 10)
    assert (r.trim_left, r.trim_right) == (1, 1)
    assert r.tmean_left == pytest.approx(5.5)
    assert r.tmean_right == pytest.approx(7.5)
    assert r.tmean_shift == pytest.approx(2.0)


def test_trimmed_mean_partial_tie_block(spark, tmp_path):
    # left = {1,1,5x6,9,9}: t=1 takes ONE of the two 1s and ONE of the
    # two 9s -> trimmed = (50 - 1 - 9)/8 = 5.0 (straddling blocks
    # contribute exactly their in-range members)
    left = (
        [(1.0, False)] * 2 + [(5.0, False)] * 6 + [(9.0, False)] * 2
    )
    right = [(5.0, True)] * 10
    sf = _sf(spark, tmp_path, left + right)
    q = entry_mod.queries()
    r = q["trimmed_mean_value_drift"](spark, sf).collect()[0]
    assert r.tmean_left == pytest.approx(5.0)
    assert r.tmean_right == pytest.approx(5.0)
    assert r.tmean_shift == pytest.approx(0.0)


def test_trimmed_mean_small_sample_no_trim(spark, tmp_path):
    # n < 10 -> t = 0, trimmed mean == plain mean; and with both sides
    # present nothing is NULL
    sf = _sf(
        spark, tmp_path,
        [(1.0, False), (2.0, False), (3.0, False), (4.0, True)],
    )
    q = entry_mod.queries()
    r = q["trimmed_mean_value_drift"](spark, sf).collect()[0]
    assert (r.trim_left, r.trim_right) == (0, 0)
    assert r.tmean_left == pytest.approx(2.0)
    assert r.tmean_right == pytest.approx(4.0)
