"""Wave 79: overdispersion diagnostics and source profile cosine —
Poisson vs clumped counts, exact cosine goldens."""

from __future__ import annotations

import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    overdispersion_by_group,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.textstats import (
    source_profile_cosine,
)


def test_overdispersion_constant_counts_zero_variance(spark):
    df = spark.createDataFrame(
        [("a", 5)] * 6, "g string, x long"
    )
    row = overdispersion_by_group(df, "g", "x").collect()[0]
    assert row.variance == pytest.approx(0.0)
    assert row.dispersion_index == pytest.approx(0.0)
    assert row.nb_alpha == pytest.approx(-1 / 5)  # (0 - 5)/25


def test_overdispersion_brute_force(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    df = spark.createDataFrame([("g", x) for x in xs], "g string, x long")
    row = overdispersion_by_group(df, "g", "x").collect()[0]
    n = len(xs)
    mean = sum(xs) / n
    var = sum((x - mean) ** 2 for x in xs) / (n - 1)
    assert row.mean == pytest.approx(mean)
    assert row.variance == pytest.approx(var)
    assert row.dispersion_index == pytest.approx(var / mean)
    assert row.nb_alpha == pytest.approx((var - mean) / mean**2)


def test_overdispersion_degenerate_single_row(spark):
    df = spark.createDataFrame([("g", 7)], "g string, x long")
    row = overdispersion_by_group(df, "g", "x").collect()[0]
    assert row.variance is None
    assert row.dispersion_index is None


def test_profile_cosine_identical_profiles(spark):
    rows = [("a", "x y z"), ("b", "x y z")]
    df = spark.createDataFrame(rows, "source string, text string")
    row = source_profile_cosine(df, "source", "text").collect()[0]
    assert row.cosine == pytest.approx(1.0)
    assert row.n_shared_tokens == 3


def test_profile_cosine_disjoint_vocab(spark):
    rows = [("a", "x x y"), ("b", "p q q")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_profile_cosine(df, "source", "text").collect()
    assert out == []  # no shared tokens -> no pair row (cosine 0)


def test_profile_cosine_golden(spark):
    """a: {x:2, y:1}; b: {x:1, y:1, z:2}: dot=3, |a|=sqrt5, |b|=sqrt6."""
    rows = [("a", "x x y"), ("b", "x y z z")]
    df = spark.createDataFrame(rows, "source string, text string")
    row = source_profile_cosine(df, "source", "text").collect()[0]
    assert row.n_shared_tokens == 2
    assert row.cosine == pytest.approx(3 / math.sqrt(5 * 6))


def test_profile_cosine_all_pairs(spark):
    rows = [("a", "x y"), ("b", "x z"), ("c", "x w")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_profile_cosine(df, "source", "text").collect()
    pairs = {(r.group_a, r.group_b) for r in out}
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}
    for r in out:
        assert r.cosine == pytest.approx(0.5)  # shared 'x' only, norms 2
