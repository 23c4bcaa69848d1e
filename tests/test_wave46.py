"""Wave-46: delete-one-group jackknife — closed forms, dominance flag,
single-group NULL."""

from __future__ import annotations

import math

from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    jackknife_group_influence,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, value double")


def test_jackknife_closed_form(spark):
    # groups: a={10, 20}, b={40} -> overall mean 2333.33 cents / 3
    rows = [("a", 10.0), ("a", 20.0), ("b", 40.0)]
    got = {r.group: r for r in jackknife_group_influence(_df(spark, rows), "g").collect()}
    assert got["a"].n_rows == 2 and got["b"].n_rows == 1
    assert math.isclose(got["a"].mean_cents, 1500.0)
    # without a: mean = 4000; without b: mean = 1500
    assert math.isclose(got["a"].mean_without, 4000.0)
    assert math.isclose(got["b"].mean_without, 1500.0)
    overall = (1000 + 2000 + 4000) / 3
    assert math.isclose(got["a"].delta_cents, 4000.0 - overall)
    assert math.isclose(got["b"].delta_cents, 1500.0 - overall)


def test_jackknife_dominant_group_flagged(spark):
    # one huge-valued group dominates: its delta dwarfs the others'
    rows = [("big", 1000.0)] * 5 + [(f"s{i}", 1.0) for i in range(10)]
    got = {r.group: r for r in jackknife_group_influence(_df(spark, rows), "g").collect()}
    deltas = {g: abs(r.delta_cents) for g, r in got.items()}
    # removing a small group still shifts the mean a little (n drops while
    # the big group stays), so compare magnitudes, not orders of magnitude
    assert deltas["big"] > 10 * max(v for g, v in deltas.items() if g != "big")


def test_jackknife_single_group_null(spark):
    rows = [("only", 5.0), ("only", 7.0)]
    [r] = jackknife_group_influence(_df(spark, rows), "g").collect()
    assert r.mean_without is None and r.delta_cents is None
