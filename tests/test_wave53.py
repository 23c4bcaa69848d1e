"""Wave 53: per-user NDCG@k (integer-millionths gain table) and exact
per-group Kendall tau-b (contingency-cell pair counting) — brute-force
goldens, tie semantics, and partition independence."""

from __future__ import annotations

import itertools
import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    kendall_tau_groups,
    ndcg_at_k,
    ndcg_weights_millionths,
)


def _brute_tau_b(xs, ys):
    """Textbook tau-b over raw pairs."""
    c = d = tx = ty = 0
    for (x1, y1), (x2, y2) in itertools.combinations(zip(xs, ys), 2):
        if x1 == x2 and y1 == y2:
            tx += 1
            ty += 1
        elif x1 == x2:
            tx += 1
        elif y1 == y2:
            ty += 1
        elif (x1 - x2) * (y1 - y2) > 0:
            c += 1
        else:
            d += 1
    n0 = len(xs) * (len(xs) - 1) // 2
    den = math.sqrt((n0 - tx) * (n0 - ty))
    return (c - d) / den if den > 0 else None


# ---------------------------------------------------------------------------
# ndcg_at_k
# ---------------------------------------------------------------------------

def test_ndcg_weight_table_values():
    w, prefix = ndcg_weights_millionths(3)
    # 1/log2(2)=1, 1/log2(3)=0.630929..., 1/log2(4)=0.5
    assert w == [1_000_000, 630_930, 500_000]
    assert prefix == [1_000_000, 1_630_930, 2_130_930]


def test_ndcg_perfect_and_miss(spark):
    history = spark.createDataFrame(
        [(10, 5), (20, 3), (30, 1)], "item long, cnt long"
    )
    # user 1 hits rank 1 only; eval size 1 -> idcg = w1 -> ndcg = 1.0
    # user 2 misses entirely -> dcg 0, ndcg 0
    evals = spark.createDataFrame(
        [("u1", 10), ("u2", 99)], "user_id string, item long"
    )
    rows = {
        r.user_id: r
        for r in ndcg_at_k(
            history, evals, "user_id", "item", k=3, weight_col="cnt"
        ).collect()
    }
    assert rows["u1"].ndcg == pytest.approx(1.0)
    assert rows["u1"].n_hits == 1
    assert rows["u2"].ndcg == pytest.approx(0.0)
    assert rows["u2"].dcg_millionths == 0


def test_ndcg_partial_hit_golden(spark):
    """Ranking = [10, 20, 30] (count desc). User evals {20, 99}:
    hit at rank 2 only -> dcg = w2, idcg = w1 + w2 (n_eval = 2)."""
    history = spark.createDataFrame(
        [(10, 5), (20, 3), (30, 1)], "item long, cnt long"
    )
    evals = spark.createDataFrame(
        [("u", 20), ("u", 99)], "user_id string, item long"
    )
    w, prefix = ndcg_weights_millionths(3)
    row = ndcg_at_k(
        history, evals, "user_id", "item", k=3, weight_col="cnt"
    ).collect()[0]
    assert row.dcg_millionths == w[1]
    assert row.idcg_millionths == prefix[1]
    assert row.ndcg == pytest.approx(w[1] / prefix[1])


def test_ndcg_eval_overflow_clamps_idcg(spark):
    """More eval items than k: idcg clamps at prefix[k] so a user with
    every top-k item still scores exactly 1.0."""
    history = spark.createDataFrame(
        [(i, 100 - i) for i in range(1, 6)], "item long, cnt long"
    )
    evals = spark.createDataFrame(
        [("u", i) for i in range(1, 6)], "user_id string, item long"
    )
    row = ndcg_at_k(history, evals, "user_id", "item", k=2).collect()[0]
    w, prefix = ndcg_weights_millionths(2)
    assert row.n_eval_items == 5
    assert row.idcg_millionths == prefix[-1]
    assert row.dcg_millionths == prefix[-1]  # items 1,2 hold ranks 1,2
    assert row.ndcg == pytest.approx(1.0)


def test_ndcg_rank_tiebreak_deterministic(spark):
    """Equal counts rank by item asc — item 1 outranks item 2, so a user
    holding only item 1 gets rank-1 gain."""
    history = spark.createDataFrame(
        [(2, 5), (1, 5)], "item long, cnt long"
    )
    evals = spark.createDataFrame([("u", 1)], "user_id string, item long")
    w, _ = ndcg_weights_millionths(2)
    row = ndcg_at_k(history, evals, "user_id", "item", k=2).collect()[0]
    assert row.dcg_millionths == w[0]


# ---------------------------------------------------------------------------
# kendall_tau_groups
# ---------------------------------------------------------------------------

def test_kendall_perfect_concordance_and_inverse(spark):
    df = spark.createDataFrame(
        [("g", i, i * 2) for i in range(1, 9)], "grp string, x long, y long"
    )
    row = kendall_tau_groups(df, "grp", "x", "y").collect()[0]
    assert float(row.tau_b) == pytest.approx(1.0)
    assert int(row.discordant) == 0
    assert int(row.n_pairs) == 28

    inv = spark.createDataFrame(
        [("g", i, -i) for i in range(1, 9)], "grp string, x long, y long"
    )
    assert float(
        kendall_tau_groups(inv, "grp", "x", "y").collect()[0].tau_b
    ) == pytest.approx(-1.0)


def test_kendall_brute_force_with_ties(spark):
    xs = [1, 1, 2, 2, 3, 3, 4, 5, 5, 6]
    ys = [2, 3, 3, 1, 5, 5, 4, 6, 2, 6]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "grp string, x long, y long"
    )
    row = kendall_tau_groups(df, "grp", "x", "y").collect()[0]
    assert float(row.tau_b) == pytest.approx(_brute_tau_b(xs, ys))


def test_kendall_constant_marginal_is_null(spark):
    df = spark.createDataFrame(
        [("g", 1, y) for y in range(5)], "grp string, x long, y long"
    )
    row = kendall_tau_groups(df, "grp", "x", "y").collect()[0]
    assert row.tau_b is None
    assert int(row.x_tie_pairs) == 10


def test_kendall_group_isolation_and_partition_independence(spark):
    xs = [1, 2, 3, 4, 2, 2]
    ys = [4, 3, 2, 1, 2, 2]
    rows = [("a", x, y) for x, y in zip(xs, ys)] + [
        ("b", i, i) for i in range(1, 5)
    ]
    df1 = spark.createDataFrame(rows, "grp string, x long, y long")
    df32 = df1.repartition(32)
    out1 = {
        r.grp: float(r.tau_b)
        for r in kendall_tau_groups(df1, "grp", "x", "y").collect()
    }
    out32 = {
        r.grp: float(r.tau_b)
        for r in kendall_tau_groups(df32, "grp", "x", "y").collect()
    }
    assert out1 == out32
    assert out1["a"] == pytest.approx(_brute_tau_b(xs, ys))
    assert out1["b"] == pytest.approx(1.0)
