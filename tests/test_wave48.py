"""Wave 48: t-closeness (ordered-band EMD, integer-exact numerator) and
per-term Jensen-Shannon divergence — hand-computed goldens."""

from __future__ import annotations

import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    js_divergence_terms,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    t_closeness_audit,
)


def test_t_closeness_concentrated_groups(spark):
    """Two groups each fully concentrated on one of two bands, uniform
    corpus: EMD between [1,0] and [.5,.5] over an ordered 2-band domain
    is exactly 0.5 for both groups."""
    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 100), ("b", 100)],
        "grp string, band long",
    )
    out = {r.grp: r for r in t_closeness_audit(df, ["grp"], "band", t=0.2).collect()}
    assert out["a"].t_closeness == 0.5 and out["b"].t_closeness == 0.5
    assert out["a"].n_bands == 2 and out["a"].n_rows == 2
    assert not out["a"].t_ok and not out["b"].t_ok


def test_t_closeness_matching_distribution_is_zero(spark):
    """A group whose band distribution equals the corpus has EMD 0 —
    the t-ok case no matter the threshold."""
    rows = [("g1", b) for b in (0, 50, 100)] * 2 + [("g2", b) for b in (0, 50, 100)]
    df = spark.createDataFrame(rows, "grp string, band long")
    out = {r.grp: r for r in t_closeness_audit(df, ["grp"], "band").collect()}
    assert out["g1"].t_closeness == 0.0 and out["g1"].t_ok
    assert out["g2"].t_closeness == 0.0 and out["g2"].t_ok


def test_t_closeness_is_partition_independent(spark):
    df = spark.createDataFrame(
        [("a", i % 3 * 10) for i in range(30)] + [("b", 0)] * 10,
        "grp string, band long",
    )
    one = {r.grp: r.t_closeness for r in t_closeness_audit(df.coalesce(1), ["grp"], "band").collect()}
    many = {r.grp: r.t_closeness for r in t_closeness_audit(df.repartition(7), ["grp"], "band").collect()}
    assert one == many  # integer numerator: bit-exact under any layout


def test_js_terms_hand_computed(spark):
    """Groups A=10x'x', B=10x'y'; corpus is 50/50. For A: term(x) =
    .5 ln(4/3) + .25 ln(2/3), term(y) = .25 ln 2 (absent category still
    contributes). Sum over A's terms = JSD(A || corpus)."""
    df = spark.createDataFrame(
        [("A", "x")] * 10 + [("B", "y")] * 10, "src string, cat string"
    )
    out = {(r.src, r.cat): r for r in js_divergence_terms(df, "src", "cat").collect()}
    t_ax = round(0.5 * math.log(4 / 3) + 0.25 * math.log(2 / 3), 6)
    t_ay = round(0.25 * math.log(2), 6)
    assert out[("A", "x")].js_term == pytest.approx(t_ax, abs=1e-6)
    assert out[("A", "y")].js_term == pytest.approx(t_ay, abs=1e-6)
    assert out[("A", "y")].n_group_cat == 0 and out[("A", "y")].n_cat == 10
    # symmetric for B
    assert out[("B", "y")].js_term == out[("A", "x")].js_term
    # bounded by ln 2
    jsd_a = out[("A", "x")].js_term + out[("A", "y")].js_term
    assert 0 < jsd_a <= math.log(2)


def test_js_terms_zero_when_group_matches_corpus(spark):
    df = spark.createDataFrame(
        [("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")],
        "src string, cat string",
    )
    for r in js_divergence_terms(df, "src", "cat").collect():
        assert r.js_term == 0.0
