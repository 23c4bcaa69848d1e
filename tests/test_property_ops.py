"""Property-based tests (hypothesis) for the dedup / ranking operators:
randomized small corpora against brute-force Python reference
implementations. Example counts are kept low — each example is a Spark
round trip — but the generators cover duplicates, empty strings, and
adversarial token overlap that hand-written cases miss."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hmpps_digital_prison_reporting_glue_poc_spark.operators import corpus as cp
from hmpps_digital_prison_reporting_glue_poc_spark.operators import dedup as dd

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small vocab -> high collision/duplication probability
_token = st.sampled_from(["a", "b", "c", "dd", "ee"])
_text = st.lists(_token, min_size=0, max_size=6).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=8)


@given(texts=_corpus)
@settings(**_SETTINGS)
def test_exact_dedup_properties(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = dd.exact_dedup(df, "doc_id", "text").collect()
    # one survivor per distinct content, and it is the minimum id
    expected = {}
    for i, t in enumerate(texts):
        expected.setdefault(t, i)
    assert {r.text: r.doc_id for r in out} == expected
    # idempotent
    df2 = spark.createDataFrame(
        [(r.doc_id, r.text) for r in out], "doc_id long, text string"
    )
    again = dd.exact_dedup(df2, "doc_id", "text").collect()
    assert sorted((r.doc_id, r.text) for r in again) == sorted(
        (r.doc_id, r.text) for r in out
    )


@given(texts=_corpus)
@settings(**_SETTINGS)
def test_jaccard_pairs_match_bruteforce(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): (r.inter, r.size_a, r.size_b)
        for r in dd.jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    sets = [set(t.split()) for t in texts]
    expected = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            if inter > 0:  # inverted index only pairs docs sharing a token
                expected[(i, j)] = (inter, len(sets[i]), len(sets[j]))
    assert got == expected


@given(texts=_corpus)
@settings(**_SETTINGS)
def test_minhash_estimates_are_calibrated_bounds(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = dd.minhash_jaccard_estimates(
        df, "doc_id", "text", num_hashes=4, rows_per_band=2, shingle_k=2
    ).collect()
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 < r.true_jaccard <= 1.0  # candidates share >= 1 shingle
        assert r.inter >= 1
        assert r.union_sz >= max(r.inter, 1)


@given(keys=st.lists(st.integers(min_value=0, max_value=10**6),
                     min_size=1, max_size=40, unique=True))
@settings(**_SETTINGS)
def test_global_sort_rank_is_total_order_permutation(spark, keys):
    rows = [(i, hashlib.md5(str(k).encode()).hexdigest()) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "doc_id long, sort_key string")
    got = cp.global_sort_rank(df, key_col="sort_key").collect()
    assert sorted(r.shuffle_rank for r in got) == list(range(1, len(rows) + 1))
    ordered = sorted(got, key=lambda r: r.shuffle_rank)
    assert [(r.sort_key, r.doc_id) for r in ordered] == sorted(
        (r.sort_key, r.doc_id) for r in got
    )
