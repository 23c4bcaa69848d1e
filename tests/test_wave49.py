"""Wave 49: exact tie-midrank Spearman and per-user reciprocal rank —
hand-computed goldens + partition independence."""

from __future__ import annotations

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    mrr_at_k,
    spearman_groups,
)


def test_spearman_perfect_monotone(spark):
    df = spark.createDataFrame(
        [("g", i, i * i) for i in range(1, 11)], "grp string, x long, y long"
    )
    out = spearman_groups(df, "grp", "x", "y").collect()[0]
    assert out.spearman_rho == pytest.approx(1.0)
    assert out.n == 10


def test_spearman_perfect_inverse_and_ties(spark):
    df = spark.createDataFrame(
        [("g", i, -i) for i in range(1, 9)], "grp string, x long, y long"
    )
    assert spearman_groups(df, "grp", "x", "y").collect()[0].spearman_rho == pytest.approx(-1.0)

    # scipy-checked golden with ties: x=[1,2,2,3], y=[10,20,20,40] -> rho=1
    # (tied x pair is tied in y too: still a perfect monotone relation)
    df2 = spark.createDataFrame(
        [("g", 1, 10), ("g", 2, 20), ("g", 2, 20), ("g", 3, 40)],
        "grp string, x long, y long",
    )
    assert spearman_groups(df2, "grp", "x", "y").collect()[0].spearman_rho == pytest.approx(1.0)


def test_spearman_tie_midranks_golden(spark):
    """x=[1,2,3,4], y=[1,1,2,2]: midranks_y = [1.5,1.5,3.5,3.5];
    scipy.stats.spearmanr gives rho = 0.894427...  (= 2/sqrt(5))."""
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 2), ("g", 4, 2)],
        "grp string, x long, y long",
    )
    rho = spearman_groups(df, "grp", "x", "y").collect()[0].spearman_rho
    assert rho == pytest.approx(2 / 5**0.5, abs=1e-12)


def test_spearman_zero_variance_is_null(spark):
    df = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 5), ("g", 3, 5)], "grp string, x long, y long"
    )
    assert spearman_groups(df, "grp", "x", "y").collect()[0].spearman_rho is None


def test_spearman_partition_independent(spark):
    rows = [("a", i % 17, (i * 13) % 23) for i in range(200)] + [
        ("b", i % 5, i % 7) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    one = {r.grp: r.spearman_rho for r in spearman_groups(df.coalesce(1), "grp", "x", "y").collect()}
    many = {r.grp: r.spearman_rho for r in spearman_groups(df.repartition(9), "grp", "x", "y").collect()}
    assert one == many  # integer sums: bit-exact under any layout


def test_mrr_first_hit_rank(spark):
    history = spark.createDataFrame(
        [(100,)] * 5 + [(200,)] * 3 + [(300,)] * 1, "item long"
    )  # ranking: 100 (r1), 200 (r2), 300 (r3)
    evals = spark.createDataFrame(
        [
            (1, 999), (1, 200),   # user 1: first hit at rank 2 -> rr 0.5
            (2, 300), (2, 100),   # user 2: best hit rank 1 -> rr 1.0
            (3, 777),             # user 3: miss -> rr 0
        ],
        "user_id long, item long",
    )
    out = {r.user_id: r for r in mrr_at_k(history, evals, k=3).collect()}
    assert out[1].first_hit_rank == 2 and out[1].rr == 0.5
    assert out[2].first_hit_rank == 1 and out[2].rr == 1.0
    assert out[3].first_hit_rank is None and out[3].rr == 0.0
    assert out[1].n_eval_items == 2


def test_mrr_k_cut_and_tie_break(spark):
    """Items tied on count rank by item asc; items outside top-k never
    hit even if purchased."""
    history = spark.createDataFrame(
        [(10,), (20,), (30,), (40,)], "item long"
    )  # all count 1: rank order 10,20,30,40; k=2 keeps {10,20}
    evals = spark.createDataFrame(
        [(1, 30), (2, 20)], "user_id long, item long"
    )
    out = {r.user_id: r for r in mrr_at_k(history, evals, k=2).collect()}
    assert out[1].rr == 0.0          # 30 is rank 3, outside k=2
    assert out[2].first_hit_rank == 2
