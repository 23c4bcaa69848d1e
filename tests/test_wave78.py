"""Wave 78: difference-in-differences (trend cancellation) and
information-gain terms (entropy feature screen)."""

from __future__ import annotations

import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    diff_in_diff,
    info_gain_terms,
)


def _did_df(spark, cells):
    """cells: {(treated, after): [outcomes]}"""
    rows = []
    for (t, a), ys in cells.items():
        rows += [(t, a, y) for y in ys]
    return spark.createDataFrame(rows, "t boolean, a boolean, y long")


def test_did_cancels_common_trend(spark):
    """Both groups gain +50 over time; treated gains +30 extra:
    did == 30 exactly (the +50 trend and the baseline gap cancel)."""
    cells = {
        (False, False): [100, 120],  # mean 110
        (False, True): [150, 170],  # mean 160 (+50 trend)
        (True, False): [200, 220],  # mean 210 (baseline gap +100)
        (True, True): [280, 300],  # mean 290 (+50 trend +30 effect)
    }
    row = diff_in_diff(_did_df(spark, cells), "t", "a", "y").collect()[0]
    assert row.did == pytest.approx(30.0)
    assert row.mean_ctrl_after == pytest.approx(160.0)
    assert row.n_treat_after == 2


def test_did_null_on_empty_cell(spark):
    cells = {
        (False, False): [1],
        (False, True): [2],
        (True, True): [3],  # no treated-before cell
    }
    row = diff_in_diff(_did_df(spark, cells), "t", "a", "y").collect()[0]
    assert row.did is None
    assert row.n_treat_before == 0


def test_did_zero_when_no_effect(spark):
    cells = {
        (False, False): [10, 20],
        (False, True): [30, 40],
        (True, False): [110, 120],
        (True, True): [130, 140],
    }
    row = diff_in_diff(_did_df(spark, cells), "t", "a", "y").collect()[0]
    assert row.did == pytest.approx(0.0)


def _ig(rows_spec, spark):
    rows = []
    for x, pos, neg in rows_spec:
        rows += [(x, True)] * pos + [(x, False)] * neg
    df = spark.createDataFrame(rows, "x string, y boolean")
    out = info_gain_terms(df, "x", "y").collect()
    h_y = out[0].h_y
    ig = h_y - sum(r.cond_entropy_term for r in out)
    return out, h_y, ig


def test_ig_perfectly_informative_feature(spark):
    """x determines y: conditional entropy 0, IG == H(Y) == 1 bit for a
    balanced label."""
    out, h_y, ig = _ig([("a", 8, 0), ("b", 0, 8)], spark)
    assert h_y == pytest.approx(1.0, abs=1e-5)
    assert ig == pytest.approx(1.0, abs=1e-5)
    assert all(r.cond_entropy_term == pytest.approx(0.0) for r in out)


def test_ig_uninformative_feature(spark):
    """Every category has the same label mix: IG ~ 0."""
    out, h_y, ig = _ig([("a", 3, 9), ("b", 2, 6), ("c", 1, 3)], spark)
    assert ig == pytest.approx(0.0, abs=1e-5)
    assert h_y == pytest.approx(
        -(0.25 * math.log2(0.25) + 0.75 * math.log2(0.75)), abs=1e-5
    )


def test_ig_brute_force(spark):
    spec = [("a", 5, 2), ("b", 1, 8), ("c", 4, 4)]
    out, h_y, ig = _ig(spec, spark)
    n = sum(p + q for _, p, q in spec)
    yy = sum(p for _, p, _ in spec)

    def h(*ps):
        return -sum(p * math.log2(p) for p in ps if p > 0)

    want_hy = h(yy / n, 1 - yy / n)
    want_cond = sum(
        (p + q) / n * h(p / (p + q), q / (p + q)) for _, p, q in spec
    )
    assert h_y == pytest.approx(want_hy, abs=1e-4)
    assert ig == pytest.approx(want_hy - want_cond, abs=1e-4)
