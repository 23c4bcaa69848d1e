"""Wave-37 operators: blocked fuzzy linkage (block cap, canonical pair
order, distance gate), smoothed target encoding (shrinkage toward the
prior), chi-square feature/label screen (independence => 0, degenerate
denominator), key-skew histogram (exact log2 bucket boundaries)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.joins import fuzzy_block_match
from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import target_encode
from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    chi2_feature_label,
    key_skew_histogram,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_fuzzy_match_within_block_only(spark):
    df = _names(
        spark,
        [
            (1, "red ring"),
            (2, "rad ring"),   # dist 1 from red ring, same block
            (3, "red bolt"),   # other block — never compared
        ],
    )
    got = fuzzy_block_match(
        df, "name", F.regexp_extract(F.col("name"), r"(\S+)$", 1), max_dist=2
    ).collect()
    assert len(got) == 1
    r = got[0]
    # canonical order: name_a < name_b
    assert (r.name_a, r.name_b, r.dist) == ("rad ring", "red ring", 1)
    assert r.block_key == "ring"


def test_fuzzy_match_distance_gate_and_weights(spark):
    df = _names(
        spark,
        [
            (1, "red ring"),
            (2, "red ring"),      # duplicate name -> weight 2, no self pair
            (3, "crimson ring"),  # dist > 2 from red ring — gated out
        ],
    )
    got = fuzzy_block_match(
        df, "name", F.regexp_extract(F.col("name"), r"(\S+)$", 1), max_dist=2
    ).collect()
    # identical names collapse to one vertex: no pairs survive the gate.
    assert got == []
    got2 = fuzzy_block_match(
        df, "name", F.regexp_extract(F.col("name"), r"(\S+)$", 1), max_dist=9
    ).collect()
    assert len(got2) == 1
    r = got2[0]
    weights = {r.name_a: r.n_a, r.name_b: r.n_b}
    assert weights == {"red ring": 2, "crimson ring": 1}


def test_fuzzy_match_max_block_cap(spark):
    # hot block "x" holds 5 distinct names; cap 4 drops the whole block,
    # the 2-name block survives.
    rows = [(i, f"name{i} x") for i in range(5)]
    rows += [(10, "aa y"), (11, "ab y")]
    got = fuzzy_block_match(
        _names(spark, rows),
        "name",
        F.regexp_extract(F.col("name"), r"(\S+)$", 1),
        max_dist=9,
        max_block=4,
    ).collect()
    assert {r.block_key for r in got} == {"y"}
    assert len(got) == 1


def test_target_encode_shrinks_rare_to_prior(spark):
    # 1000 'a' rows at 1.00, one 'b' row at 100.00; prior ~ mean of all.
    rows = [("a", 1.0)] * 1000 + [("b", 100.0)]
    df = spark.createDataFrame(rows, "cat string, value double")
    got = {r.cat: r for r in target_encode(df, "cat", m=100.0).collect()}
    prior = (1000 * 100 + 10000) / 1001.0  # cents
    # b: one observation, pseudo-count 100 -> pulled almost to the prior
    exp_b = (10000 + 100.0 * prior) / 101.0
    assert math.isclose(got["b"].encoded, exp_b, rel_tol=1e-12)
    assert got["b"].n == 1 and got["b"].sum_cents == 10000
    # a: 1000 observations dominate the pseudo-count
    exp_a = (100000 + 100.0 * prior) / 1100.0
    assert math.isclose(got["a"].encoded, exp_a, rel_tol=1e-12)
    # rare category sits closer to the prior than its raw mean does
    assert abs(got["b"].encoded - prior) < abs(10000 - prior)


def test_chi2_independent_feature_is_zero(spark):
    # label split identical in both bins -> ad == bc -> chi2 exactly 0.
    rows = [("x", 1)] * 10 + [("x", 0)] * 30 + [("y", 1)] * 20 + [("y", 0)] * 60
    df = spark.createDataFrame(rows, "bin_val string, lab int")
    got = {
        r.bin: r.chi2
        for r in chi2_feature_label(df, "bin_val", F.col("lab") == 1).collect()
    }
    assert got == {"x": 0.0, "y": 0.0}


def test_chi2_perfect_association(spark):
    # all positives in 'x', all negatives in 'y' -> chi2 == N per bin.
    rows = [("x", 1)] * 8 + [("y", 0)] * 12
    df = spark.createDataFrame(rows, "bin_val string, lab int")
    got = {
        r.bin: r for r in chi2_feature_label(df, "bin_val", F.col("lab") == 1).collect()
    }
    assert math.isclose(got["x"].chi2, 20.0, rel_tol=1e-12)
    assert math.isclose(got["y"].chi2, 20.0, rel_tol=1e-12)
    assert got["x"].n_pos == 8 and got["y"].n_pos == 0


def test_chi2_single_bin_degenerate_denominator(spark):
    # one bin only: c + d == 0 -> den == 0 -> defined as 0, not NaN.
    df = spark.createDataFrame([("x", 1), ("x", 0)], "bin_val string, lab int")
    [r] = chi2_feature_label(df, "bin_val", F.col("lab") == 1).collect()
    assert r.chi2 == 0.0


def test_key_skew_histogram_exact_buckets(spark):
    # key sizes 1, 2, 3, 4, 8, 1023, 1024 -> buckets 0,1,1,2,3,9,10.
    sizes = {"a": 1, "b": 2, "c": 3, "d": 4, "e": 8, "f": 1023, "g": 1024}
    rows = [(k,) for k, n in sizes.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "k string")
    got = {r.log2_bucket: r for r in key_skew_histogram(df, ["k"]).collect()}
    assert set(got) == {0, 1, 2, 3, 9, 10}
    assert got[1].n_keys == 2 and got[1].min_rows == 2 and got[1].max_rows == 3
    assert got[9].min_rows == 1023 and got[9].max_rows == 1023
    assert got[10].min_rows == 1024
    assert sum(r.sum_rows for r in got.values()) == sum(sizes.values())
