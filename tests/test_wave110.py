"""Wave 110: per-group spread & center drift — Brown-Forsythe
variance-drift terms (robust Levene on |x - group median|) and Mood's
median test (pooled-median split chi-square). Per-group term rows with
fixed per-row IEEE trees (no cross-row float sums); consumers sum the
terms into the F / chi-square statistic. Goldens are cross-checked
against independent numpy implementations of the textbook formulas.
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pytest

import __spark_entry__ as entry_mod
from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    brown_forsythe_terms,
    median_test_terms,
)


def _sf(spark, tmp_path, groups):
    """groups: {event_type: [values]} -> events.parquet fixture."""
    ts = datetime.datetime(2024, 1, 5, 12)
    data = []
    i = 0
    for g, vals in groups.items():
        for v in vals:
            data.append((i, ts, 100 + i, g, v, "{}"))
            i += 1
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def _ref_bf_w(groups):
    """Independent Brown-Forsythe W over cent-quantized values: one-way
    ANOVA F on Z_ij = |x_ij - median_i| (lower+upper-middle median,
    matching the operator's doubled-integer median exactly)."""
    zs = []
    for vals in groups.values():
        x = np.sort(np.round(np.asarray(vals) * 100).astype("int64"))
        n = len(x)
        med = (x[(n - 1) // 2] + x[n // 2]) / 2.0
        zs.append(np.abs(x - med) / 100.0)
    big_n = sum(len(z) for z in zs)
    k = len(zs)
    zbar = np.concatenate(zs).mean()
    between = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
    within = sum(((z - z.mean()) ** 2).sum() for z in zs)
    return (big_n - k) / (k - 1) * between / within


def test_bf_terms_match_independent_reference(spark, tmp_path):
    groups = {
        "calm": [10.0, 10.5, 11.0, 10.2, 10.8, 10.4],
        "wild": [2.0, 25.0, 9.0, 30.0, 1.0, 16.0],
        "mid": [8.0, 12.0, 10.0, 14.0, 6.0],
    }
    sf = _sf(spark, tmp_path, groups)
    rows = entry_mod.queries()["brown_forsythe_value_by_type"](
        spark, sf
    ).collect()
    assert {r.event_type for r in rows} == set(groups)
    big_n = sum(len(v) for v in groups.values())
    k = len(groups)
    w = (
        (big_n - k)
        / (k - 1)
        * sum(r.between_term for r in rows)
        / sum(r.within_ss for r in rows)
    )
    assert w == pytest.approx(_ref_bf_w(groups), rel=1e-9)
    # the wild group's mean |x - median| dwarfs the calm group's
    by = {r.event_type: r for r in rows}
    assert by["wild"].z_mean > 5 * by["calm"].z_mean


def test_bf_even_n_median_is_middle_average(spark, tmp_path):
    # group of 4: median of {1, 2, 4, 8} is 3.0 -> z = {2, 1, 1, 5}
    sf = _sf(spark, tmp_path, {"a": [1.0, 2.0, 4.0, 8.0], "b": [1.0, 1.0]})
    rows = {
        r.event_type: r
        for r in brown_forsythe_terms(
            entry_mod._events(spark, sf), "event_type", "value"
        ).collect()
    }
    assert rows["a"].z_mean == pytest.approx(2.25)
    assert rows["b"].z_mean == 0.0
    assert rows["b"].within_ss == 0.0


def test_median_test_golden(spark, tmp_path):
    # pooled = {1..8}: doubled median 9 (4.0|5.0); above = {5,6,7,8}
    # group a = {1,2,3,4} -> 0 above; group b = {5,6,7,8} -> 4 above
    groups = {"a": [1.0, 2.0, 3.0, 4.0], "b": [5.0, 6.0, 7.0, 8.0]}
    sf = _sf(spark, tmp_path, groups)
    rows = {
        r.event_type: r
        for r in entry_mod.queries()["median_test_value_by_type"](
            spark, sf
        ).collect()
    }
    assert rows["a"].n_above == 0 and rows["b"].n_above == 4
    assert rows["a"].expected_above == pytest.approx(2.0)
    # 2x2 at total separation: chi2 = N = 8 (each group's two cells sum
    # to (8*0-4*4)^2/(8*4*4) + (8*4-4*4)^2/(8*4*4) = 2 + 2 = 4)
    assert sum(r.chi2_term for r in rows.values()) == pytest.approx(8.0)


def test_median_test_degenerate_margin_null(spark, tmp_path):
    # every value identical: nothing is above the pooled median ->
    # the above-margin is empty and the test is undefined (NULL terms)
    sf = _sf(spark, tmp_path, {"a": [5.0, 5.0], "b": [5.0]})
    rows = median_test_terms(
        entry_mod._events(spark, sf), "event_type", "value"
    ).collect()
    assert all(r.chi2_term is None for r in rows)
    assert all(r.n_above == 0 for r in rows)


def test_bf_null_group_kept(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 9.0), ("g", 4.0), ("g", 6.0), ("g", 5.0)],
        "t string, value double",
    )
    rows = {r.t: r for r in brown_forsythe_terms(df, "t", "value").collect()}
    assert set(rows) == {None, "g"}
    assert rows[None].n == 2
    assert rows[None].z_mean == pytest.approx(4.0)
