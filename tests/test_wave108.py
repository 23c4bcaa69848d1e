"""Wave 108: polynomial-kernel MMD^2 by exact moment factorization —
hand-computed goldens + degenerate contracts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from hmpps_digital_prison_reporting_glue_poc_spark.operators.mmd import mmd2_quadratic


def test_mmd2_identical_multisets_exactly_zero(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1), (2, [0.0, 1.0], 1),
            (3, [1.0, 0.0], 7), (4, [0.0, 1.0], 7),
        ],
        "vec_id long, embedding array<float>, label long",
    )
    r = mmd2_quadratic(df, F.col("label") < 5, "embedding").collect()[0]
    # biased V-statistic: exactly 0 for identical multisets, no epsilon
    assert (r.n_left, r.n_right, r.mmd2) == (2, 2, 0.0)


def test_mmd2_hand_golden(spark):
    # x=(1,0) vs y=(0.5,0.5), d=2, scale=1e6:
    # k(x,x)=(0.5+1)^2=2.25, k(y,y)=(0.25+1)^2=1.5625,
    # k(x,y)=(0.25+1)^2=1.5625 -> mmd2 = 2.25+1.5625-2*1.5625 = 0.6875
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 1), (2, [0.5, 0.5], 7)],
        "vec_id long, embedding array<float>, label long",
    )
    r = mmd2_quadratic(df, F.col("label") < 5, "embedding").collect()[0]
    assert r.mmd2 == pytest.approx(0.6875)


def test_mmd2_empty_side_and_empty_table(spark):
    one_side = spark.createDataFrame(
        [(1, [1.0, 0.0], 1)], "vec_id long, embedding array<float>, label long"
    )
    # label 1 -> side True -> the RIGHT population
    r = mmd2_quadratic(one_side, F.col("label") < 5, "embedding").collect()[0]
    assert (r.n_left, r.n_right, r.mmd2) == (0, 1, None)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label long"
    )
    r = mmd2_quadratic(empty, F.col("label") < 5, "embedding").collect()[0]
    assert (r.n_left, r.n_right, r.mmd2) == (0, 0, None)


def test_mmd2_excludes_null_and_misdimensioned(spark):
    """The probe dimension is deterministically the MAX vector length
    over non-NULL vectors (r11, from the r10 advice — a .first() probe
    was partition-order-dependent and the two engines could filter
    DIFFERENT row sets on heterogeneous-dim tables). Here max dim = 2:
    NULL (id 3) and the dim-1 stragglers (ids 4, 6) are excluded; both
    sides keep exactly their dim-2 rows."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1), (2, [0.5, 0.5], 7),
            (3, None, 1), (4, [1.0], 7), (6, [0.5], 1),
        ],
        "vec_id long, embedding array<float>, label long",
    )
    r = mmd2_quadratic(df, F.col("label") < 5, "embedding").collect()[0]
    assert (r.n_left, r.n_right) == (1, 1)
    assert r.mmd2 == pytest.approx(0.6875)


def test_mmd2_probe_dim_is_max_not_first(spark):
    """Order-independence of the probe: a longer vector anywhere in the
    table defines the dimension, regardless of which row an engine
    happens to read first."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1),            # dim 2 — excluded under max=3
            (2, [1.0, 0.0, 0.0], 7),       # dim 3, right
            (3, [0.0, 1.0, 0.0], 1),       # dim 3, left
        ],
        "vec_id long, embedding array<float>, label long",
    )
    r = mmd2_quadratic(df, F.col("label") < 5, "embedding").collect()[0]
    assert (r.n_left, r.n_right) == (1, 1)
    # orthogonal unit vectors: K(x,x)=K(y,y)=(1/3+1)^2, K(x,y)=1
    # MMD^2 = 2*(16/9) - 2*1 = 14/9
    assert r.mmd2 == pytest.approx(14.0 / 9.0)


def test_mmd2_registry_runs(spark, tmp_path):
    docs = [(i, [0.25 * ((i + j) % 5) for j in range(8)], i % 10)
            for i in range(20)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        docs, "vec_id long, embedding array<float>, label long"
    ).write.parquet(os.path.join(sf, "embeddings.parquet"))
    r = entry_mod.queries()["mmd2_embedding_drift"](spark, sf).collect()
    assert len(r) == 1 and r[0].n_left + r[0].n_right == 20
