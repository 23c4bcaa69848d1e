"""Wave-38 operators: split-leakage audit (bounded fan-out, pair
orientation), 2-D Pareto frontier (dominance edge cases: ties, duplicate
points, cross-bucket pruning), rolling daily revenue (gap handling),
value-decile transition (exact rank parity with a plain window)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    rolling_daily_revenue,
    value_decile_transition,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import split_leakage_audit
from hmpps_digital_prison_reporting_glue_poc_spark.operators.sampling import pareto_front_2d


def test_split_leakage_counts(spark):
    rows = [
        # fp1 in train(2 docs) + test(1 doc) -> leaks on (test, train)
        (1, "f1", "train"), (2, "f1", "train"), (3, "f1", "test"),
        # fp2 only in train -> no leak
        (4, "f2", "train"), (5, "f2", "train"),
        # fp3 in val + test -> leaks on (test, val)
        (6, "f3", "val"), (7, "f3", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, fingerprint string, split string")
    got = {
        (r.split_a, r.split_b): r
        for r in split_leakage_audit(df).collect()
    }
    assert set(got) == {("test", "train"), ("test", "val")}
    r = got[("test", "train")]
    assert r.n_shared_fps == 1 and r.n_docs_a == 1 and r.n_docs_b == 2
    r = got[("test", "val")]
    assert r.n_shared_fps == 1 and r.n_docs_a == 1 and r.n_docs_b == 1


def test_pareto_front_basic_and_ties(spark):
    pts = [
        (1, 10, 1),   # frontier (max x)
        (2, 5, 5),    # frontier
        (3, 1, 10),   # frontier (max y)
        (4, 4, 4),    # dominated by (5,5)
        (5, 5, 5),    # duplicate of 2 — both kept (weak dominance)
        (6, 5, 3),    # same x as 2, lower y -> dominated
        (7, 10, 0),   # same x as 1, lower y -> dominated
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted((r.id) for r in pareto_front_2d(df, "id", "x", "y").collect())
    assert got == [1, 2, 3, 5]


def test_pareto_front_matches_bruteforce(spark):
    import random

    rng = random.Random(38)
    pts = [(i, rng.randrange(0, 50), rng.randrange(0, 50)) for i in range(300)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(r.id for r in pareto_front_2d(df, "id", "x", "y", n_buckets=8).collect())
    brute = sorted(
        i
        for (i, x, y) in pts
        if not any(
            ox >= x and oy >= y and (ox > x or oy > y) for (_, ox, oy) in pts
        )
    )
    assert got == brute


def test_rolling_revenue_gap_correct(spark):
    base = datetime.datetime(2024, 1, 1, 12)
    rows = [
        (1, base, "purchase", 1.00),
        (2, base + datetime.timedelta(days=1), "purchase", 2.00),
        # 8-day gap: day 9 window must NOT include day 0/1
        (3, base + datetime.timedelta(days=9), "purchase", 4.00),
        (4, base + datetime.timedelta(days=9), "view", 99.0),  # filtered
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {r.day.isoformat(): r for r in rolling_daily_revenue(df).collect()}
    assert got["2024-01-01"].cents_7d == 100
    assert got["2024-01-02"].cents_7d == 300 and got["2024-01-02"].n_days_7d == 2
    assert got["2024-01-10"].cents_7d == 400 and got["2024-01-10"].n_days_7d == 1


def test_decile_transition_matches_plain_window(spark):
    import random

    rng = random.Random(7)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(40):
        for _ in range(rng.randrange(1, 6)):
            eid += 1
            rows.append(
                (
                    eid,
                    u,
                    "purchase",
                    base + datetime.timedelta(days=rng.randrange(0, 30)),
                    round(rng.uniform(1, 400), 2),
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )
    got = {
        (r.decile_from, r.decile_to): r.n_users
        for r in value_decile_transition(df).collect()
    }
    # reference: plain (single-partition) window on the same quantization
    df.createOrReplaceTempView("ev38")
    ref_rows = spark.sql(
        """
        WITH q AS (
          SELECT user_id AS u,
                 datediff(to_date(ts), DATE '1970-01-01') AS d,
                 CAST(ROUND(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS qv
          FROM ev38 WHERE event_type = 'purchase'),
        span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM q),
        per AS (
          SELECT u,
                 CASE WHEN d >= (SELECT (lo + hi + 1) DIV 2 FROM span)
                      THEN 1 ELSE 0 END AS period,
                 CAST(SUM(qv) AS BIGINT) AS cents
          FROM q GROUP BY 1, 2),
        ranked AS (
          SELECT u, period,
                 (10 * (ROW_NUMBER() OVER
                        (PARTITION BY period ORDER BY cents, u) - 1))
                 DIV (COUNT(*) OVER (PARTITION BY period)) AS tile
          FROM per)
        SELECT p0.tile AS f, p1.tile AS t, COUNT(*) AS n
        FROM ranked p0 JOIN ranked p1 ON p0.u = p1.u
        WHERE p0.period = 0 AND p1.period = 1
        GROUP BY 1, 2
        """
    ).collect()
    ref = {(r.f, r.t): r.n for r in ref_rows}
    assert got == ref
    # deciles span [0, 9] only
    assert all(0 <= a <= 9 and 0 <= b <= 9 for (a, b) in got)
