"""Wave 80: per-file scan audit and rank-dependence grid — multi-file
counting, copula invariants."""

from __future__ import annotations

import os

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    file_row_audit,
    rank_quintile_dependence,
)


def test_file_audit_counts_per_file(spark, tmp_path):
    """Two explicit parquet files: the audit reports each basename with
    its exact row count."""
    p1 = os.path.join(str(tmp_path), "a.parquet")
    p2 = os.path.join(str(tmp_path), "b.parquet")
    spark.range(7).coalesce(1).write.parquet(p1)
    spark.range(13).coalesce(1).write.parquet(p2)
    df = spark.read.parquet(p1, p2)
    out = file_row_audit(df).collect()
    assert sum(r.n_rows for r in out) == 20
    assert {r.n_rows for r in out} == {7, 13}
    assert all(r.file_name.endswith(".parquet") for r in out)


def test_rank_dependence_perfect_monotone_diagonal(spark):
    """y = x: all mass sits on the grid diagonal; off-diagonal cells
    exist (grid completion) with observed 0."""
    rows = [(i, i, f"r{i:03d}") for i in range(100)]
    df = spark.createDataFrame(rows, "x long, y long, id string")
    out = {
        (r.x_tile, r.y_tile): r
        for r in rank_quintile_dependence(df, "x", "y", "id").collect()
    }
    assert len(out) == 25  # completed 5x5 grid
    for (xt, yt), r in out.items():
        if xt == yt:
            assert r.observed == 20
            assert r.ratio == pytest.approx(5.0)
        else:
            assert r.observed == 0


def test_rank_dependence_independent_factorial(spark):
    """Full 20x20 factorial (every (x, y) combo exactly once): the
    joint is EXACTLY the product of marginals -> every cell ratio 1."""
    rows = [(i % 20, i // 20, f"r{i:04d}") for i in range(400)]
    df = spark.createDataFrame(rows, "x long, y long, id string")
    out = rank_quintile_dependence(df, "x", "y", "id").collect()
    assert len(out) == 25
    for r in out:
        assert r.observed == 16
        assert r.expected == pytest.approx(16.0)
        assert r.ratio == pytest.approx(1.0)


def test_rank_dependence_mass_conservation(spark):
    import random

    rng = random.Random(3)
    rows = [
        (rng.randint(0, 50), rng.randint(0, 99), f"r{i:04d}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "x long, y long, id string")
    out = rank_quintile_dependence(df, "x", "y", "id").collect()
    assert sum(r.observed for r in out) == 200
    assert sum(r.expected for r in out) == pytest.approx(200.0)
