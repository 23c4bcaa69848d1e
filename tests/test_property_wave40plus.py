"""Property-based tests (hypothesis) for the round-6 wave 40-42
operators: randomized inputs against brute-force Python models."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import exact_auc
from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import (
    equifreq_edges,
    grouped_percent_rank,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.retrieval import skipgram_counts

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.booleans(),
        ),
        min_size=2,
        max_size=60,
    ),
    width=st.sampled_from([1, 3, 100]),
)
@settings(**_SETTINGS)
def test_auc_property_matches_pairwise(spark, pairs, width):
    df = spark.createDataFrame(pairs, "s long, lab boolean")
    [r] = exact_auc(df, "s", "lab", bucket_width=width).collect()
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    if not pos or not neg:
        assert r.auc is None
        return
    wins = sum(1 for a in pos for b in neg if a > b)
    ties = sum(1 for a in pos for b in neg if a == b)
    brute = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert math.isclose(r.auc, brute, rel_tol=1e-12)


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=25), min_size=4, max_size=80
    ),
    n_bins=st.sampled_from([2, 4, 5]),
)
@settings(**_SETTINGS)
def test_equifreq_edges_property(spark, vals, n_bins):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.edge_idx: (r.edge_value, r.target_rank, r.cum_count)
        for r in equifreq_edges(df, "v", n_bins=n_bins, bucket_width=5).collect()
    }
    s = sorted(vals)
    n = len(s)
    assert set(got) == set(range(1, n_bins))
    for j in range(1, n_bins):
        target = -(-j * n // n_bins)
        assert got[j][1] == target
        assert got[j][0] == s[target - 1]
        assert got[j][2] == sum(1 for v in vals if v <= s[target - 1])


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_grouped_pctrank_property(spark, rows):
    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g string, v long")
    got = {
        r.id: r.pct_rank
        for r in grouped_percent_rank(df, "g", "v", "id", bucket_width=3).collect()
    }
    by_g = {}
    for i, g, v in data:
        by_g.setdefault(g, []).append((v, i))
    for g, evs in by_g.items():
        evs.sort()
        n = len(evs)
        for pos, (v, i) in enumerate(evs):
            expect = 0.0 if n == 1 else pos / (n - 1)
            assert math.isclose(got[i], expect, rel_tol=1e-12), (g, i)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    gap=st.sampled_from([1, 2, 3]),
)
@settings(**_SETTINGS)
def test_skipgram_property(spark, texts, gap):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.w1, r.w2): (r.n_pairs, r.n_docs)
        for r in skipgram_counts(
            df, gap=gap, min_count=1, top_k=None
        ).collect()
    }
    from collections import Counter

    cnt = Counter()
    docs = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        for j in range(len(toks) - gap):
            pair = (toks[j], toks[j + gap])
            cnt[pair] += 1
            docs.setdefault(pair, set()).add(i)
    expect = {p: (n, len(docs[p])) for p, n in cnt.items()}
    assert got == expect
