"""Wave-27 operators: vocabulary OOV rate, bigram lift collocations,
water-filling token-budget allocation, corpus snapshot diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import snapshot_diff
from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import (
    token_budget_waterfill,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.textstats import (
    bigram_lift_top,
    vocab_oov_rate,
)


def _sized(spark, sizes: dict[str, int]):
    return spark.createDataFrame(
        [(s, n) for s, n in sizes.items()], "source string, n_tokens long"
    )


def test_waterfill_exhausts_budget_exactly_when_capped(spark):
    out = {
        r.source: r
        for r in token_budget_waterfill(
            _sized(spark, {"a": 100, "b": 200, "c": 700}), budget=600
        ).collect()
    }
    # waterline c=250: a keeps 100, b keeps 200, c clipped to 250 -> hmm
    # total = 100+200+250 = 550 <= 600; c=300 gives 600 exactly
    assert out["a"].allocated_tokens == 100 and not out["a"].capped
    assert out["b"].allocated_tokens == 200 and not out["b"].capped
    assert out["c"].allocated_tokens == 300 and out["c"].capped
    assert sum(r.allocated_tokens for r in out.values()) == 600


def test_waterfill_uncapped_when_budget_covers_all(spark):
    out = token_budget_waterfill(
        _sized(spark, {"a": 10, "b": 20}), budget=1000
    ).collect()
    assert all(not r.capped for r in out)
    assert {r.source: r.allocated_tokens for r in out} == {"a": 10, "b": 20}


def test_waterfill_budget_below_smallest(spark):
    out = {
        r.source: r.allocated_tokens
        for r in token_budget_waterfill(
            _sized(spark, {"a": 50, "b": 60, "c": 70}), budget=90
        ).collect()
    }
    assert out == {"a": 30, "b": 30, "c": 30}  # c = 90 div 3


def test_waterfill_matches_bruteforce(spark):
    sizes = {"s%02d" % i: (i * 37) % 90 + 5 for i in range(12)}
    budget = 400
    out = {
        r.source: (r.allocated_tokens, r.capped)
        for r in token_budget_waterfill(
            _sized(spark, sizes), budget=budget
        ).collect()
    }
    # brute force the integer waterline
    best_c = max(
        c for c in range(0, max(sizes.values()) + 1)
        if sum(min(s, c) for s in sizes.values()) <= budget
    )
    for name, size in sizes.items():
        assert out[name][0] == min(size, best_c), name
        assert out[name][1] == (size > best_c), name


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "alpha", "s1"), (2, "beta", "s1"), (3, "gamma", "s2")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(2, "beta", "s1"), (3, "gamma2", "s2"), (4, "delta", "s2")],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source, r.status): r.n_docs
        for r in snapshot_diff(old, new, "doc_id", ("text",), "source").collect()
    }
    assert got == {
        ("s1", "removed"): 1,     # doc 1
        ("s1", "unchanged"): 1,   # doc 2
        ("s2", "changed"): 1,     # doc 3
        ("s2", "added"): 1,       # doc 4
    }


def test_snapshot_diff_without_group(spark):
    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "b")], "doc_id long, text string")
    got = {r.status: r.n_docs for r in
           snapshot_diff(old, new, "doc_id", ("text",), None).collect()}
    assert got == {"changed": 1}


def test_vocab_oov_rate_counts(spark):
    docs = spark.createDataFrame(
        [(1, "x x x y"), (2, "x z q")],
        "doc_id long, text string",
    )
    # vocab_size=2 -> top tokens by freq desc, token asc: x(4), y/z/q tie
    # at 1 -> 'q' wins the tie alphabetically
    got = {r.doc_id: r for r in
           vocab_oov_rate(docs, "doc_id", "text", vocab_size=2).collect()}
    assert got[1].n_tokens == 4 and got[1].n_oov == 1       # y OOV
    assert got[2].n_tokens == 3 and got[2].n_oov == 1       # z OOV, q in
    assert got[2].oov_rate == pytest.approx(1 / 3)


def test_bigram_lift_exact(spark):
    # corpus bigrams: (a b) x3, (b a) x2, (c d) x1  -> N=6
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "c d")],
        "doc_id long, text string",
    )
    rows = bigram_lift_top(docs, "text", min_count=1, k=10).collect()
    got = {(r.x, r.y): (r.c_xy, r.lift) for r in rows}
    # margins: left a=3, left b=2, left c=1; right b=3, right a=2, right d=1
    assert got[("a", "b")] == (3, 3 * 6 / (3 * 3))
    assert got[("b", "a")] == (2, 2 * 6 / (2 * 2))
    assert got[("c", "d")] == (1, 1 * 6 / (1 * 1))
    # ordering: lift desc, count desc -> (c,d) lift 6 first, then (b,a) 3,
    # then (a,b) 2
    assert [(r.x, r.y) for r in rows] == [("c", "d"), ("b", "a"), ("a", "b")]


def test_bigram_lift_single_token_docs_contribute_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    rows = bigram_lift_top(docs, "text", min_count=1, k=10).collect()
    assert [(r.x, r.y, r.c_xy) for r in rows] == [("a", "b", 1)]
