"""Wave 62: empirical-Bayes beta-binomial rate shrinkage and quantile
normalization — shrinkage direction/ordering, degenerate priors, and
distribution-matching invariants."""

from __future__ import annotations

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import (
    eb_shrunk_rates,
    quantile_normalize,
)


def _rates_df(spark, spec):
    """spec: {category: (n, n_pos)} -> row-level frame."""
    rows = []
    for c, (n, y) in spec.items():
        rows += [(c, True)] * y + [(c, False)] * (n - y)
    return spark.createDataFrame(rows, "cat string, o boolean")


def test_eb_shrinks_toward_pooled_mean(spark):
    """A small category's extreme rate moves toward mu more than a big
    category's equally extreme rate."""
    spec = {
        "big_hi": (1000, 800),
        "big_lo": (1000, 200),
        "small_hi": (5, 4),
        "small_lo": (5, 1),
    }
    out = {r.cat: r for r in eb_shrunk_rates(_rates_df(spark, spec), "cat", "o").collect()}
    mu = (800 + 200 + 4 + 1) / (1000 + 1000 + 5 + 5)
    assert out["small_hi"].prior_strength is not None
    # shrinkage: shrunk between raw and mu, and small moves more
    for c in spec:
        r = out[c]
        lo, hi = sorted((r.raw_rate, mu))
        assert lo - 1e-12 <= r.shrunk_rate <= hi + 1e-12
    move_small = abs(out["small_hi"].shrunk_rate - out["small_hi"].raw_rate)
    move_big = abs(out["big_hi"].shrunk_rate - out["big_hi"].raw_rate)
    assert move_small > move_big


def test_eb_posterior_closed_form(spark):
    """Whatever prior strength M the moments produce, each shrunk rate
    must equal (y + M*mu)/(n + M) exactly."""
    spec = {"a": (10, 9), "b": (20, 2), "c": (30, 15), "d": (4, 4)}
    out = {r.cat: r for r in eb_shrunk_rates(_rates_df(spark, spec), "cat", "o").collect()}
    total_n = sum(n for n, _ in spec.values())
    total_y = sum(y for _, y in spec.values())
    mu = total_y / total_n
    m = out["a"].prior_strength
    assert m is not None and m > 0
    for c, (n, y) in spec.items():
        assert out[c].shrunk_rate == pytest.approx((y + m * mu) / (n + m))


def test_eb_single_category_degenerate(spark):
    out = eb_shrunk_rates(_rates_df(spark, {"only": (10, 3)}), "cat", "o").collect()
    assert out[0].prior_strength is None
    assert out[0].shrunk_rate is None
    assert out[0].raw_rate == pytest.approx(0.3)


def test_eb_no_spread_degenerate(spark):
    """Identical rates across categories: between-variance ~ 0 -> the
    moment fit is degenerate (v <= 0 never happens with equal rates;
    v == 0 exactly) -> NULL shrinkage."""
    spec = {"a": (10, 5), "b": (10, 5), "c": (10, 5)}
    out = eb_shrunk_rates(_rates_df(spark, spec), "cat", "o").collect()
    assert all(r.prior_strength is None for r in out)


def test_qnorm_identical_groups_map_to_self(spark):
    """When every group already has the pooled distribution, the mapping
    is the identity."""
    rows = [(g, v) for g in ("a", "b") for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = quantile_normalize(df, "g", "v").collect()
    assert all(r.normalized_value == r.v for r in out)


def test_qnorm_shifted_group_maps_onto_pooled(spark):
    """Group b = group a + 100: b's values map DOWN into the pooled
    distribution and the mapped multiset is identical for both groups
    (the quantile-normalization invariant)."""
    a_vals = [10, 20, 30, 40]
    rows = [("a", v) for v in a_vals] + [("b", v + 100) for v in a_vals]
    df = spark.createDataFrame(rows, "g string, v long")
    out = quantile_normalize(df, "g", "v").collect()
    mapped = {}
    for r in out:
        mapped.setdefault(r.g, []).append(r.normalized_value)
    assert sorted(mapped["a"]) == sorted(mapped["b"])


def test_qnorm_rank_arithmetic_exact(spark):
    """3-value group inside a 9-value pool: target ranks are
    ceil(r*9/3) = 3, 6, 9."""
    rows = [("s", v) for v in (5, 10, 15)] + [
        ("t", v) for v in (1, 2, 3, 4, 6, 7)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r.v: r
        for r in quantile_normalize(df, "g", "v").filter("g = 's'").collect()
    }
    assert out[5].target_rank == 3
    assert out[10].target_rank == 6
    assert out[15].target_rank == 9
    # pooled sorted: 1,2,3,4,5,6,7,10,15 -> ranks 3,6,9 -> 3, 6, 15
    assert out[5].normalized_value == 3
    assert out[10].normalized_value == 6
    assert out[15].normalized_value == 15


def test_qnorm_partition_independence(spark):
    rows = [("a", i % 7) for i in range(70)] + [
        ("b", (i * 3) % 11) for i in range(44)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    key = lambda r: (r.g, r.v)
    a = {key(r): r.normalized_value for r in quantile_normalize(df, "g", "v").collect()}
    b = {
        key(r): r.normalized_value
        for r in quantile_normalize(df.repartition(16), "g", "v").collect()
    }
    assert a == b
