"""Wave-42: entity resolution composition (string-label components,
transitivity, singletons) and skip-gram counts (exact positions, gap
semantics, deterministic top-k)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.graph import connected_components
from hmpps_digital_prison_reporting_glue_poc_spark.operators.retrieval import skipgram_counts


def test_connected_components_string_labels(spark):
    # chain a-b-c plus isolated pair x-y: min-name labels
    edges = spark.createDataFrame(
        [("bb", "aa"), ("bb", "cc"), ("xx", "yy")], "id_a string, id_b string"
    )
    got = {r.id: r.comp for r in connected_components(edges).collect()}
    assert got == {"aa": "aa", "bb": "aa", "cc": "aa", "xx": "xx", "yy": "xx"}


def test_connected_components_numeric_still_works(spark):
    edges = spark.createDataFrame([(2, 1), (2, 3), (7, 8)], "id_a long, id_b long")
    got = {r.id: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_skipgram_gap_semantics(spark):
    # "a b c d": gap-2 pairs are (a,c) and (b,d); gap-1 would be bigrams
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a x c")], "doc_id long, text string"
    )
    got = {
        (r.w1, r.w2): (r.n_pairs, r.n_docs)
        for r in skipgram_counts(df, gap=2, min_count=1, top_k=None).collect()
    }
    assert got == {("a", "c"): (2, 2), ("b", "d"): (1, 1)}


def test_skipgram_short_docs_and_mincount(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, ""), (4, "a b c"), (5, "a b c")],
        "doc_id long, text string",
    )
    got = {
        (r.w1, r.w2): r.n_pairs
        for r in skipgram_counts(df, gap=2, min_count=2, top_k=None).collect()
    }
    # only docs 4, 5 have a gap-2 pair; (a, c) appears twice -> passes cut
    assert got == {("a", "c"): 2}


def test_skipgram_topk_deterministic_ties(spark):
    df = spark.createDataFrame(
        [(1, "b x a"), (2, "b y a"), (3, "a x b"), (4, "a y b")],
        "doc_id long, text string",
    )
    rows = skipgram_counts(df, gap=2, min_count=1, top_k=1).collect()
    # (a, b) and (b, a) both have n_pairs=2: tie broken by w1 asc
    assert [(r.w1, r.w2) for r in rows] == [("a", "b")]


def test_connected_components_long_chain_converges(spark):
    # a 300-hop chain needs 300 rounds under plain propagation (>> the
    # default max_iter=25); pointer jumping converges in O(log n) rounds
    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = {r.id: r.comp for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_connected_components_random_matches_unionfind(spark):
    import random

    rng = random.Random(4242)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.comp for r in connected_components(df).collect()}
    # brute union-find
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        parent[find(a)] = find(b)
    comp_min = {}
    verts = {v for e in edges for v in e}
    for v in verts:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expect = {v: comp_min[find(v)] for v in verts}
    assert got == expect
