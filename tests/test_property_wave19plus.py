"""Property-based tests (hypothesis) for the wave-19..23 operators:
randomized inputs against brute-force Python models. Example counts are
low (each example is a Spark round trip); generators cover repeats,
short docs, skewed weights, and random graphs."""

from __future__ import annotations

import hashlib
import itertools
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hmpps_digital_prison_reporting_glue_poc_spark.operators import corpus as cp
from hmpps_digital_prison_reporting_glue_poc_spark.operators import dedup as dd
from hmpps_digital_prison_reporting_glue_poc_spark.operators import graph as gr
from hmpps_digital_prison_reporting_glue_poc_spark.operators import sampling as sp
from hmpps_digital_prison_reporting_glue_poc_spark.operators import topk as tk

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_token = st.sampled_from(["a", "b", "c", "dd"])
_text = st.lists(_token, min_size=0, max_size=10).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=6)


@given(texts=_corpus)
@settings(**_SETTINGS)
def test_dup_span_stats_property(spark, texts):
    w = 3
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in dd.dup_span_stats(df, window_tokens=w).collect()
    }
    spans = {}
    per_doc = {}
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        wins = (
            [" ".join(toks[j : j + w]) for j in range(len(toks) - w + 1)]
            if len(toks) >= w
            else [" ".join(toks)]
        )
        per_doc[i] = wins
        for s in wins:
            spans[s] = spans.get(s, 0) + 1
    expect = {
        i: (len(wins), sum(1 for s in wins if spans[s] >= 2))
        for i, wins in per_doc.items()
    }
    assert got == expect


@given(
    lengths=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=12)
)
@settings(**_SETTINGS)
def test_length_bucket_packing_property(spark, lengths):
    df = spark.createDataFrame(
        [(i, " ".join(["t"] * n)) for i, n in enumerate(lengths)],
        "doc_id long, text string",
    )
    out = cp.length_bucket_packing(df, max_tokens=64).collect()
    assert sum(r.n_docs for r in out) == len(lengths)
    for r in out:
        padded_len = 1 << (r.bucket + 1)
        assert r.padded_tokens == r.n_docs * padded_len
        # every bucket-b doc has floor(log2(n)) == b
        # batch sizes: all batches except possibly the last per bucket
        # are full
        assert r.n_docs <= max(1, 64 // padded_len)
    # per-bucket doc totals match
    by_bucket = {}
    for r in out:
        by_bucket[r.bucket] = by_bucket.get(r.bucket, 0) + r.n_docs
    expect_bucket = {}
    for n in lengths:
        b = n.bit_length() - 1
        expect_bucket[b] = expect_bucket.get(b, 0) + 1
    assert by_bucket == expect_bucket


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=8),
)
@settings(**_SETTINGS)
def test_weighted_topk_property(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        r.doc_id for r in sp.weighted_topk_sample(df, "w", "doc_id", k=k).collect()
    ]

    def key(i, w):
        u32 = int(hashlib.md5(f"wrs:{i}".encode()).hexdigest()[:8], 16)
        return round(math.log((u32 + 1) / 2**32), 6) / w

    expect = [
        i for i, _ in sorted(rows, key=lambda t: (-key(*t), t[0]))[:k]
    ]
    assert got == expect


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60)
)
@settings(**_SETTINGS)
def test_hll_matches_python_model(spark, keys):
    df = spark.createDataFrame([(i,) for i in keys], "user_id long")
    r = tk.hll_distinct(df, "user_id").collect()[0]
    # python model of the same sketch
    regs = {}
    for i in set(keys):
        h = int(hashlib.md5(f"hll:{i}".encode()).hexdigest()[:8], 16)
        j, w = h % 256, h // 256
        rho = 25 - w.bit_length() if w > 0 else 25
        regs[j] = max(regs.get(j, 0), rho)
    S = sum(1 << (25 - M) for M in regs.values()) + (256 - len(regs)) * (1 << 25)
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 256.0 * 256.0 * float(1 << 25) / float(S)
    n_zero = 256 - len(regs)
    if raw <= 2.5 * 256 and n_zero > 0:
        expect = 256.0 * round(math.log(256.0 / n_zero), 6)
    else:
        expect = raw
    assert r.n_exact == len(set(keys))
    assert abs(r.hll_estimate - expect) < 1e-9


@given(
    edges=st.lists(
        st.tuples(
            st.sampled_from("abcdef"), st.sampled_from("abcdef")
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_triangle_census_property(spark, edges):
    # encode the edge list as 2-token documents
    df = spark.createDataFrame(
        [(i, f"{a} {b}") for i, (a, b) in enumerate(edges)],
        "doc_id long, text string",
    )
    r = gr.token_graph_triangles(df).collect()[0]
    eset = {frozenset(e) for e in edges}
    nodes = sorted({v for e in eset for v in e})
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= eset
    )
    deg = {v: sum(1 for e in eset if v in e) for v in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (
        len(nodes),
        len(eset),
        wedges,
        tri,
    )
