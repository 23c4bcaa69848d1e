"""Wave 73: exact weighted median (integer threshold test) and
declarative constraint validation — brute-force medians, rule
semantics, violation counting."""

from __future__ import annotations

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    validate_constraints,
    weighted_median_by_group,
)


def _brute_wmedian(pairs):
    """Lower weighted median of (value, weight) pairs."""
    total = sum(w for _, w in pairs)
    cum = 0
    for v, w in sorted(pairs):
        cum += w
        if 2 * cum >= total:
            return v
    raise AssertionError


def test_wmedian_unweighted_matches_plain_median(spark):
    rows = [("g", v, 1) for v in [1, 3, 5, 7, 9]]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    row = weighted_median_by_group(df, "g", "v", "w").collect()[0]
    assert row.weighted_median == 5
    assert row.total_weight == 5


def test_wmedian_heavy_weight_dominates(spark):
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 100, 10)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    row = weighted_median_by_group(df, "g", "v", "w").collect()[0]
    assert row.weighted_median == 100


def test_wmedian_brute_force_multi_group(spark):
    import random

    rng = random.Random(5)
    rows, expect = [], {}
    for g in ("a", "b", "c"):
        pairs = [
            (rng.randint(0, 50), rng.randint(1, 9)) for _ in range(30)
        ]
        rows += [(g, v, w) for v, w in pairs]
        expect[g] = _brute_wmedian(pairs)
    df = spark.createDataFrame(rows, "g string, v long, w long")
    out = {
        r.g: r.weighted_median
        for r in weighted_median_by_group(df, "g", "v", "w").collect()
    }
    assert out == expect


def test_wmedian_even_split_takes_lower(spark):
    """Weights 1/1 on values 10/20: 2*cum(10)=2 >= 2 -> lower median 10."""
    df = spark.createDataFrame(
        [("g", 10, 1), ("g", 20, 1)], "g string, v long, w long"
    )
    assert (
        weighted_median_by_group(df, "g", "v", "w").collect()[0].weighted_median
        == 10
    )


def test_validate_rules_and_counts(spark):
    rows = [
        (1, 10.0, "A"),
        (2, -5.0, "B"),
        (None, 50.0, "C"),
        (4, 2000.0, "D"),
    ]
    df = spark.createDataFrame(rows, "k long, price double, status string")
    out = {
        r.rule_idx: r
        for r in validate_constraints(
            df,
            [
                {"column": "k", "not_null": True},
                {"column": "price", "min": 0},
                {"column": "price", "max": 1000},
                {"column": "status", "max_distinct": 3},
            ],
        ).collect()
    }
    assert out[0].n_violations == 1 and not out[0].ok
    assert out[1].n_violations == 1 and out[1].rule == "min"
    assert out[2].n_violations == 1
    assert out[3].n_violations == 1  # 4 distinct > 3 -> excess 1
    assert all(r.n_checked == 4 for r in out.values())


def test_validate_clean_table_all_ok(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 7.0)], "k long, price double"
    )
    out = validate_constraints(
        df,
        [
            {"column": "k", "not_null": True},
            {"column": "price", "min": 0},
            {"column": "price", "max": 10},
        ],
    ).collect()
    assert all(r.ok for r in out)
    assert [r.rule_idx for r in sorted(out, key=lambda r: r.rule_idx)] == [
        0,
        1,
        2,
    ]


def test_validate_unknown_rule_rejected(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        validate_constraints(df, [{"column": "k", "bogus": 1}])
