"""Wave 109: two-sample Anderson-Darling A2_akN (tail-sensitive drift)
and per-group KS — hand-verified goldens through the queries()
registry, an independent numpy Scholz-Stephens reference, and the
empty-side NULL contracts."""

from __future__ import annotations

import datetime
import os

import numpy as np
import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, rows, types=None):
    """rows: (value, after_split); types: optional per-row event_type."""
    ts_before = datetime.datetime(2024, 1, 5, 12)
    ts_after = datetime.datetime(2024, 2, 5, 12)
    data = [
        (
            i,
            ts_after if after else ts_before,
            100 + i,
            (types[i] if types else "click"),
            v,
            "{}",
        )
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


def _ref_a2(x, y):
    """Independent Scholz-Stephens (1987) A2_akN, k=2, midrank/tie form
    — float64, no grid tricks; the operator must agree to the 1e-6
    per-term fixed-point quantization."""
    x = np.asarray(x, dtype="int64")
    y = np.asarray(y, dtype="int64")
    z = np.sort(np.unique(np.concatenate([x, y])))
    n1, n2 = len(x), len(y)
    big_n = n1 + n2
    c1 = np.array([(x == v).sum() for v in z])
    c2 = np.array([(y == v).sum() for v in z])
    f1, f2 = np.cumsum(c1), np.cumsum(c2)
    h, b = c1 + c2, np.cumsum(c1 + c2)
    ba = b - h / 2.0
    tot = 0.0
    for ni, fi, ci in ((n1, f1, c1), (n2, f2, c2)):
        ma = fi - ci / 2.0
        d = ba * (big_n - ba) - big_n * h / 4.0
        m = d > 0
        tot += (
            np.sum((h[m] / big_n) * (big_n * ma[m] - ni * ba[m]) ** 2 / d[m])
            / ni
        )
    return (big_n - 1) / big_n * tot


def test_ad_matches_independent_reference(spark, tmp_path):
    left = [100, 200, 200, 300, 700, 150]
    right = [200, 300, 300, 900, 150]
    rows = [(v / 100.0, False) for v in left] + [
        (v / 100.0, True) for v in right
    ]
    sf = _sf(spark, tmp_path, rows)
    got = entry_mod.queries()["ad_value_drift"](spark, sf).collect()[0]
    assert (got.n_left, got.n_right) == (len(left), len(right))
    assert got.ad_a2 == pytest.approx(_ref_a2(left, right), abs=1e-5)


def test_ad_identical_sides_near_zero(spark, tmp_path):
    vals = [1.0, 2.0, 2.0, 3.0, 5.0]
    rows = [(v, False) for v in vals] + [(v, True) for v in vals]
    sf = _sf(spark, tmp_path, rows)
    got = entry_mod.queries()["ad_value_drift"](spark, sf).collect()[0]
    ref = _ref_a2(
        [int(v * 100) for v in vals], [int(v * 100) for v in vals]
    )
    assert got.ad_a2 == pytest.approx(ref, abs=1e-5)


def test_ad_empty_side_null(spark, tmp_path):
    sf = _sf(spark, tmp_path, [(1.0, False), (2.0, False)])
    got = entry_mod.queries()["ad_value_drift"](spark, sf).collect()[0]
    assert (got.n_left, got.n_right) == (2, 0)
    assert got.ad_a2 is None


def test_ad_single_pooled_value_zero(spark, tmp_path):
    """One distinct pooled value: every D4 is 0 (degenerate grid) —
    terms contribute 0 and the statistic is exactly 0, not an error."""
    sf = _sf(spark, tmp_path, [(2.0, False), (2.0, True), (2.0, True)])
    got = entry_mod.queries()["ad_value_drift"](spark, sf).collect()[0]
    assert got.ad_a2 == 0.0


def test_ks_by_group_golden(spark, tmp_path):
    # group A: left {1,2}, right {2,3} -> d over grid 100/200/300 is
    # |f1*n2 - f2*n1| = 2,2,0 -> D = 2/(2*2) = 0.5 at value 1.00
    # group B: left {1}, right {1} -> identical, D = 0
    rows = [
        (1.0, False), (2.0, False), (2.0, True), (3.0, True),  # A
        (1.0, False), (1.0, True),  # B
    ]
    types = ["a", "a", "a", "a", "b", "b"]
    sf = _sf(spark, tmp_path, rows, types)
    got = {
        r.event_type: r
        for r in entry_mod.queries()["ks_drift_by_type"](spark, sf).collect()
    }
    assert got["a"].ks_d == pytest.approx(0.5)
    assert got["a"].ks_at_value == pytest.approx(1.0)
    assert got["b"].ks_d == 0.0


def test_ks_by_group_null_group_and_empty_side(spark, tmp_path):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import ks_by_group

    df = spark.createDataFrame(
        [
            (None, False, 1.0),
            (None, True, 2.0),
            ("only_left", False, 3.0),
        ],
        "g string, r boolean, value double",
    )
    got = {r.g: r for r in ks_by_group(df, "g", "r").collect()}
    assert set(got) == {None, "only_left"}
    # NULL group is a real population: KS over {1.0} vs {2.0} is 1.0
    assert got[None].ks_d == pytest.approx(1.0)
    # one-sided group: stats NULL, counts kept
    assert got["only_left"].n_right == 0
    assert got["only_left"].ks_d is None
