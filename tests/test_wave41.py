"""Wave-41 operators: hot-group percent_rank (parity vs plain window,
single-row group), equal-frequency edges (order-statistic exactness vs
brute force, duplicate-heavy values)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import (
    equifreq_edges,
    grouped_percent_rank,
)


def test_grouped_pctrank_matches_plain_window(spark):
    import random

    rng = random.Random(41)
    rows = [
        (i, rng.choice(["a", "b", "c"]), rng.randrange(0, 5000))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {
        r.id: r.pct_rank
        for r in grouped_percent_rank(df, "g", "v", "id", bucket_width=700).collect()
    }
    df.createOrReplaceTempView("w41")
    ref = {
        r.id: r.pr
        for r in spark.sql(
            "SELECT id, percent_rank() OVER "
            "(PARTITION BY g ORDER BY v, id) AS pr FROM w41"
        ).collect()
    }
    assert set(got) == set(ref)
    for i in got:
        assert math.isclose(got[i], ref[i], rel_tol=1e-12), i


def test_grouped_pctrank_single_row_group(spark):
    df = spark.createDataFrame(
        [(1, "only", 5), (2, "pair", 1), (3, "pair", 9)],
        "id long, g string, v long",
    )
    got = {r.id: r.pct_rank for r in grouped_percent_rank(df, "g", "v", "id").collect()}
    assert got[1] == 0.0
    assert got[2] == 0.0 and got[3] == 1.0


def test_equifreq_edges_bruteforce(spark):
    import random

    rng = random.Random(99)
    vals = [rng.randrange(0, 40) for _ in range(157)]  # heavy duplicates
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.edge_idx: (r.edge_value, r.target_rank, r.cum_count)
        for r in equifreq_edges(df, "v", n_bins=4, bucket_width=7).collect()
    }
    s = sorted(vals)
    n = len(s)
    for j in (1, 2, 3):
        target = -(-j * n // 4)  # ceil
        edge = s[target - 1]     # value at that rank
        assert got[j][0] == edge, j
        assert got[j][1] == target
        # cum_count is the full count of values <= edge
        assert got[j][2] == sum(1 for v in vals if v <= edge)


def test_equifreq_edges_exact_quartiles_uniform(spark):
    df = spark.createDataFrame([(v,) for v in range(1, 101)], "v long")
    got = {
        r.edge_idx: r.edge_value
        for r in equifreq_edges(df, "v", n_bins=4).collect()
    }
    assert got == {1: 25, 2: 50, 3: 75}
