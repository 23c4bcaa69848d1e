"""Wave-43: feature-hash collision audit (partitioning invariants,
planted collision) and split-conformal threshold (exact order statistic,
coverage guarantee on held-out data, alpha-too-small NULL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    conformal_threshold,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import feature_hash_stats


def test_feature_hash_partitions_everything(spark):
    rows = [(t, b) for t in ("x", "y", "z") for b in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, "t string, b long")
    got = feature_hash_stats(df, ["t", "b"], n_buckets=8).collect()
    assert sum(r.n_rows for r in got) == len(rows)
    # 30 distinct crosses over 8 buckets: all crosses accounted for
    assert sum(r.n_distinct_crosses for r in got) == 30
    # pigeonhole: at least one bucket must hold >1 cross
    assert max(r.n_distinct_crosses for r in got) > 1
    assert all(0 <= r.bucket < 8 for r in got)


def test_feature_hash_no_collision_when_wide(spark):
    rows = [("a", 1), ("b", 2)]
    df = spark.createDataFrame(rows, "t string, b long")
    got = feature_hash_stats(df, ["t", "b"], n_buckets=4096).collect()
    # 2 crosses in 4096 buckets: collision essentially impossible (and
    # deterministic — md5, not a seed)
    assert len(got) == 2
    assert all(r.n_distinct_crosses == 1 and r.n_rows == 1 for r in got)


def test_conformal_exact_order_statistic(spark):
    # scores 1..100, alpha=0.1 -> target = ceil(101*0.9) = 91 -> value 91
    df = spark.createDataFrame([(v,) for v in range(1, 101)], "s long")
    [r] = conformal_threshold(df, "s", alpha=0.1, bucket_width=7).collect()
    assert (r.n, r.target_rank, r.threshold) == (100, 91, 91)


def test_conformal_coverage_on_exchangeable_data(spark):
    # empirical check of the guarantee: threshold from a calibration
    # split covers >= (1 - alpha) of an exchangeable test split
    import random

    rng = random.Random(43)
    scores = [rng.randrange(0, 10_000) for _ in range(2_000)]
    calib, test = scores[:1000], scores[1000:]
    df = spark.createDataFrame([(v,) for v in calib], "s long")
    [r] = conformal_threshold(df, "s", alpha=0.1).collect()
    covered = sum(1 for v in test if v <= r.threshold) / len(test)
    assert covered >= 0.85  # 0.9 guarantee minus sampling slack


def test_conformal_alpha_too_small_is_null(spark):
    # n=4, alpha=0.1 -> target = ceil(5*0.9) = 5 > 4 -> NULL threshold
    df = spark.createDataFrame([(v,) for v in range(4)], "s long")
    [r] = conformal_threshold(df, "s", alpha=0.1).collect()
    assert r.n == 4 and r.target_rank == 5 and r.threshold is None
