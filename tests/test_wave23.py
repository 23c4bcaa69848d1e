"""Wave-23 operators: HyperLogLog, Count-Min sketch, triangle census —
each checked against its mathematical guarantee and a brute-force model."""

from __future__ import annotations

import hashlib
import itertools

from hmpps_digital_prison_reporting_glue_poc_spark.operators.graph import (
    token_graph_triangles,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import (
    cms_token_estimates,
    hll_distinct,
)


def test_hll_estimate_within_standard_error(spark):
    # 2000 distinct keys, 256 registers: sigma = 1.04/sqrt(256) = 6.5%;
    # assert within 4 sigma (the hash is fixed, so this is deterministic
    # and tight in practice)
    df = spark.createDataFrame(
        [(i % 2000,) for i in range(6000)], "user_id long"
    )
    r = hll_distinct(df, "user_id").collect()[0]
    assert r.n_exact == 2000
    assert r.rel_error < 0.26


def test_hll_small_range_uses_linear_counting(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "user_id long")
    r = hll_distinct(df, "user_id").collect()[0]
    # linear counting on nearly-empty registers is near-exact
    assert r.n_exact == 10
    assert abs(r.hll_estimate - 10) < 1.0


def test_hll_is_duplicate_insensitive(spark):
    a = spark.createDataFrame([(i,) for i in range(500)], "user_id long")
    b = spark.createDataFrame(
        [(i % 500,) for i in range(5000)], "user_id long"
    )
    ra = hll_distinct(a, "user_id").collect()[0]
    rb = hll_distinct(b, "user_id").collect()[0]
    assert ra.hll_estimate == rb.hll_estimate


def test_cms_never_underestimates_and_is_tight_here(spark):
    rows = [(1, "apple " * 50 + "banana " * 20 + "cherry " * 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.token: r for r in cms_token_estimates(
        df, width=1024, depth=3, probe_k=10
    ).collect()}
    assert got["apple"].n_true == 50
    for r in got.values():
        assert r.cms_estimate >= r.n_true
        assert r.overestimate >= 0
    # 3 tokens into 3x1024 cells: collisions essentially impossible
    assert all(r.overestimate == 0 for r in got.values())


def _brute_triangles(edges):
    nodes = sorted({v for e in edges for v in e})
    eset = {frozenset(e) for e in edges}
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= eset
    )
    deg = {v: sum(1 for e in eset if v in e) for v in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return len(nodes), len(eset), wedges, tri


def test_triangle_census_matches_brute_force(spark):
    # text is a token walk; bigrams define the edges
    rows = [
        (1, "a b c a"),      # triangle a-b-c
        (2, "c d e c"),      # triangle c-d-e
        (3, "a d"),          # extra edge, no new triangle
        (4, "f g"),          # disconnected edge
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = token_graph_triangles(df).collect()[0]
    edges = set()
    for _, text in rows:
        t = text.split()
        for i in range(len(t) - 1):
            if t[i] != t[i + 1]:
                edges.add(tuple(sorted((t[i], t[i + 1]))))
    n, e, w, tri = _brute_triangles(edges)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (n, e, w, tri)
    assert abs(r.transitivity - 3 * tri / w) < 1e-12


def test_triangle_census_complete_graph(spark):
    # K4 as a token walk: every pair adjacent -> C(4,3)=4 triangles,
    # transitivity exactly 1
    walk = "a b a c a d b c b d c d"
    df = spark.createDataFrame([(1, walk)], "doc_id long, text string")
    r = token_graph_triangles(df).collect()[0]
    assert r.n_edges == 6 and r.n_triangles == 4
    assert r.transitivity == 1.0


def test_hll_empty_input_emits_null_estimate(spark):
    empty = spark.createDataFrame([], "user_id long")
    r = hll_distinct(empty, "user_id").collect()[0]
    assert r.n_exact == 0
    assert r.hll_estimate is None and r.rel_error is None
