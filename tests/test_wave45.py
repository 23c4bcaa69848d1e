"""Wave-45: Poisson bootstrap — determinism, partition independence,
Poisson(1) draw distribution, and CI sanity against the analytic SE."""

from __future__ import annotations

import math
import statistics

from hmpps_digital_prison_reporting_glue_poc_spark.operators.sampling import (
    poisson_bootstrap_means,
)


def _df(spark, vals, parts=None):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, value double"
    )
    return df.repartition(parts) if parts else df


def test_bootstrap_deterministic_and_partition_independent(spark):
    vals = [float(v % 37) for v in range(500)]
    a = sorted(map(tuple, poisson_bootstrap_means(_df(spark, vals), "id").collect()))
    b = sorted(map(tuple, poisson_bootstrap_means(_df(spark, vals, parts=7), "id").collect()))
    assert a == b
    assert len(a) == 32


def test_bootstrap_weights_are_poisson1(spark):
    # mean multiplicity ~= 1: total effective n across replicas close to
    # n_rows * n_replicas
    n = 2000
    vals = [1.0] * n
    got = poisson_bootstrap_means(_df(spark, vals), "id", n_replicas=16).collect()
    total_eff = sum(r.n_eff for r in got)
    assert abs(total_eff - n * 16) < 4 * math.sqrt(n * 16)  # 4 sigma
    # every replica's mean of a constant column is exactly that constant
    assert all(r.mean_cents == 100.0 for r in got if r.n_eff > 0)


def test_bootstrap_spread_tracks_analytic_se(spark):
    import random

    rng = random.Random(45)
    vals = [rng.uniform(0, 100) for _ in range(4000)]
    got = poisson_bootstrap_means(_df(spark, vals), "id", n_replicas=32).collect()
    means = [r.mean_cents for r in got]
    boot_se = statistics.stdev(means)
    cents = [round(v * 100) for v in vals]
    analytic_se = statistics.pstdev(cents) / math.sqrt(len(cents))
    # Poisson bootstrap SE should approximate the analytic SE of the mean
    # within broad factors (32 replicas is noisy)
    assert analytic_se / 2.5 < boot_se < analytic_se * 2.5
