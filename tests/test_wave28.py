"""Wave-28 operators: RRF fusion, dedup representative selection, exact
two-sample KS drift."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import ks_two_sample
from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
    keep_best_per_component,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.retrieval import rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_rrf_fuse_scores_and_order(spark):
    r1 = _ranking(spark, [(10, 1), (20, 2), (30, 3)])
    r2 = _ranking(spark, [(20, 1), (40, 2)])
    out = rrf_fuse([r1, r2], "doc_id", k0=60, limit=10).collect()
    got = {r.doc_id: (r.rank_1, r.rank_2, r.rrf_score) for r in out}
    assert got[20] == (2, 1, pytest.approx(1 / 62 + 1 / 61))
    assert got[10] == (1, None, pytest.approx(1 / 61))
    assert got[40] == (None, 2, pytest.approx(1 / 62))
    assert got[30] == (3, None, pytest.approx(1 / 63))
    # doc in both lists dominates; 10 and 40 tie-region ordered by score
    order = [r.doc_id for r in out]
    assert order[0] == 20 and order[1] == 10  # 1/61 > 1/62
    assert order[2] == 40 and order[3] == 30


def test_rrf_fuse_limit_and_tiebreak(spark):
    r1 = _ranking(spark, [(2, 1), (1, 2)])
    r2 = _ranking(spark, [(1, 1), (2, 2)])
    out = rrf_fuse([r1, r2], "doc_id", k0=60, limit=1).collect()
    # symmetric scores -> tie broken by doc_id asc
    assert [r.doc_id for r in out] == [1]


def test_keep_best_per_component(spark):
    df = spark.createDataFrame(
        [(1, 100, 5), (2, 100, 9), (3, 100, 9), (4, 200, -1)],
        "doc_id long, component long, score long",
    )
    got = {
        r.component: (r.n_docs, r.kept_id, r.kept_score)
        for r in keep_best_per_component(
            df, "doc_id", "component", "score"
        ).collect()
    }
    # max score 9 shared by docs 2 and 3 -> smallest id wins
    assert got[100] == (3, 2, 9)
    assert got[200] == (1, 4, -1)


def _ks_brute(left, right):
    values = sorted(set(left) | set(right))
    n1, n2 = len(left), len(right)
    best = (0, None)
    c1 = c2 = 0
    for v in values:
        c1 += sum(1 for x in left if x == v)
        c2 += sum(1 for x in right if x == v)
        d = abs(c1 / n1 - c2 / n2)
        if d > best[0] + 1e-15:
            best = (d, v)
    return best


def test_ks_two_sample_matches_bruteforce(spark):
    left = [1.00, 1.50, 2.00, 2.00, 3.25, 4.00]
    right = [2.00, 3.00, 3.25, 5.00, 6.50]
    rows = [(v, False) for v in left] + [(v, True) for v in right]
    df = spark.createDataFrame(rows, "value double, is_right boolean")
    out = ks_two_sample(df, "is_right", "value", scale=100).collect()[0]
    d, at = _ks_brute(left, right)
    assert out.n_left == len(left) and out.n_right == len(right)
    assert out.ks_d == pytest.approx(d, abs=1e-12)
    assert out.ks_at_value == pytest.approx(at)


def test_ks_identical_distributions_is_zero(spark):
    vals = [1.0, 2.0, 3.0] * 4
    rows = [(v, i % 2 == 0) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "value double, is_right boolean")
    out = ks_two_sample(df, "is_right", "value").collect()[0]
    assert out.ks_d == 0.0


def test_ks_disjoint_distributions_is_one(spark):
    rows = [(1.0, False), (2.0, False), (10.0, True), (11.0, True)]
    df = spark.createDataFrame(rows, "value double, is_right boolean")
    out = ks_two_sample(df, "is_right", "value").collect()[0]
    assert out.ks_d == 1.0
    assert out.ks_at_value == pytest.approx(2.0)
