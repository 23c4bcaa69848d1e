"""Wave 107: distribution-distance drift functionals (Wasserstein-1,
two-sample Cramer-von Mises, energy/Cramer distance) — hand-computed
goldens through the queries() registry, plus the empty-side NULL
contract."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, rows):
    """rows: (value, after_split) — after_split=True lands past the
    2024-01-20 wrapper split."""
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


def test_drift_distances_golden(spark, tmp_path):
    # left = {1.00, 2.00}, right = {2.00, 3.00} (cents 100/200/300)
    # grid: 100 (c1=1,c2=0), 200 (1,1), 300 (0,1); n1=n2=2
    # f1: 1,2,2  f2: 0,1,2  d=f1*n2-f2*n1: 2,2,0  gaps: 100,100,0
    sf = _sf(
        spark, tmp_path,
        [(1.0, False), (2.0, False), (2.0, True), (3.0, True)],
    )
    q = entry_mod.queries()
    w = q["wasserstein_value_drift"](spark, sf).collect()[0]
    # W1 = (2*100 + 2*100)/(2*2*100) = 1.0 — the distributions are a
    # unit shift apart, and W1 reports exactly the shift
    assert (w.n_left, w.n_right) == (2, 2)
    assert w.w1 == pytest.approx(1.0)
    c = q["cvm_value_drift"](spark, sf).collect()[0]
    # T = sum c*(d^2) / (N^2*n1*n2) = (1*4 + 2*4 + 0)/(16*4) = 0.1875
    assert c.cvm_t == pytest.approx(0.1875)
    e = q["energy_value_drift"](spark, sf).collect()[0]
    # D = 2*(4*100 + 4*100)/((2*2)^2*100) = 1.0; cross-checked against
    # the pairwise definition 2E|X-Y| - E|X-X'| - E|Y-Y'|
    # = 2*1.0 - 0.5 - 0.5 = 1.0
    assert e.energy_d == pytest.approx(1.0)


def test_drift_distances_identical_sides_zero(spark, tmp_path):
    sf = _sf(
        spark, tmp_path,
        [(5.0, False), (7.0, False), (5.0, True), (7.0, True)],
    )
    q = entry_mod.queries()
    assert q["wasserstein_value_drift"](spark, sf).collect()[0].w1 == 0.0
    assert q["cvm_value_drift"](spark, sf).collect()[0].cvm_t == 0.0
    assert q["energy_value_drift"](spark, sf).collect()[0].energy_d == 0.0


def test_drift_distances_empty_side_null(spark, tmp_path):
    # every event lands before the split: right side empty -> one row,
    # NULL statistic (the ks_two_sample r9 contract)
    sf = _sf(spark, tmp_path, [(1.0, False), (2.0, False)])
    q = entry_mod.queries()
    for name, col in (
        ("wasserstein_value_drift", "w1"),
        ("cvm_value_drift", "cvm_t"),
        ("energy_value_drift", "energy_d"),
    ):
        rows = q[name](spark, sf).collect()
        assert len(rows) == 1
        assert rows[0][col] is None, name


def test_w1_matches_mean_shift(spark, tmp_path):
    # for a pure location shift W1 equals the |mean difference|
    sf = _sf(
        spark, tmp_path,
        [(1.0, False), (4.0, False), (1.5, True), (4.5, True)],
    )
    w = entry_mod.queries()["wasserstein_value_drift"](spark, sf).collect()[0]
    assert w.w1 == pytest.approx(0.5)


def test_w1_by_group_golden_null_group_and_empty_side(spark, tmp_path):
    """wasserstein_by_group: per-group grid, NULL group kept (null-safe
    joins), per-group empty-side NULL."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import wasserstein_by_group

    ts_b = datetime.datetime(2024, 1, 5, 12)
    ts_a = datetime.datetime(2024, 2, 5, 12)
    rows = [
        # group A: the unit-shift golden -> w1 = 1.0
        (0, ts_b, 1, "A", 1.0, "{}"),
        (1, ts_b, 1, "A", 2.0, "{}"),
        (2, ts_a, 1, "A", 2.0, "{}"),
        (3, ts_a, 1, "A", 3.0, "{}"),
        # group B: right side empty -> NULL
        (4, ts_b, 1, "B", 5.0, "{}"),
        # NULL group: 0.0 -> 1.0 shift -> w1 = 1.0
        (5, ts_b, 1, None, 0.0, "{}"),
        (6, ts_a, 1, None, 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import pyspark.sql.functions as SF

    out = {
        r.event_type: (r.n_left, r.n_right, r.w1)
        for r in wasserstein_by_group(
            df,
            "event_type",
            SF.col("ts") >= SF.lit("2024-01-20").cast("timestamp"),
            "value",
        ).collect()
    }
    assert out["A"] == (2, 2, pytest.approx(1.0))
    assert out["B"] == (1, 0, None)
    assert out[None] == (1, 1, pytest.approx(1.0))
