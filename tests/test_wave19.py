"""Wave-19 operators: repeated-substring dedup, Bloom decontamination,
inverted index, exact stratified sampling, length-bucketed packing,
token PageRank, audio-frame energy."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators import corpus as cp
from hmpps_digital_prison_reporting_glue_poc_spark.operators import dedup as dd
from hmpps_digital_prison_reporting_glue_poc_spark.operators import graph as gr
from hmpps_digital_prison_reporting_glue_poc_spark.operators import multimodal as mm
from hmpps_digital_prison_reporting_glue_poc_spark.operators import retrieval as rt
from hmpps_digital_prison_reporting_glue_poc_spark.operators import sampling as sp


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- dup spans

def _brute_span_stats(rows, w):
    spans = {}
    per_doc = {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        wins = (
            [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]
            if len(toks) >= w
            else [" ".join(toks)]
        )
        per_doc[doc_id] = wins
        for s in wins:
            spans[s] = spans.get(s, 0) + 1
    out = {}
    for doc_id, wins in per_doc.items():
        dup = sum(1 for s in wins if spans[s] >= 2)
        out[doc_id] = (len(wins), dup)
    return out


def test_dup_span_stats_matches_brute_force(spark):
    rows = [
        (1, "a b c d e f"),  # shares the 4-window "a b c d" with doc 2
        (2, "x a b c d y"),
        (3, "p q r s t u"),  # unique
        (4, "m m m m m m m"),  # within-doc repeats: all windows identical
        (5, "s h o r t"),  # shorter than window -> whole-text span
    ]
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in dd.dup_span_stats(
            _docs(spark, rows), window_tokens=4
        ).collect()
    }
    assert got == _brute_span_stats(rows, 4)


# ---------------------------------------------------------------- bloom

def test_bloom_has_no_false_negatives(spark):
    """Every gram actually present in the filter-side corpus must be
    flagged when probed — Bloom filters may over-flag, never under-flag."""
    eval_rows = [(100, "alpha beta gamma delta"), (200, "one two three")]
    # train docs that literally contain eval trigrams
    train_rows = [
        (1, "xx alpha beta gamma yy"),
        (2, "one two three"),
        (3, "zz ww vv uu"),  # no overlap: flagged count may be >0 only by FP
    ]
    bits = rt.bloom_bit_positions(
        _docs(spark, eval_rows), ngram_n=3, m_bits=4096, k_hashes=3
    )
    probed = {
        r.doc_id: r
        for r in rt.bloom_probe_docs(
            _docs(spark, train_rows), bits, ngram_n=3, m_bits=4096,
            k_hashes=3,
        ).collect()
    }
    # doc 1 contains "alpha beta gamma"; doc 2 contains "one two three"
    assert probed[1].n_flagged >= 1
    assert probed[2].n_flagged >= 1
    assert probed[2].flagged_share == 1.0  # its only gram IS an eval gram
    assert probed[3].n_grams == 2


def test_bloom_filter_is_bounded(spark):
    bits = rt.bloom_bit_positions(
        _docs(spark, [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)]),
        ngram_n=3,
        m_bits=256,
        k_hashes=3,
    ).collect()
    assert 0 < len(bits) <= 256
    assert all(0 <= r.bit_pos < 256 for r in bits)


# ---------------------------------------------------------------- inverted

def test_inverted_index_postings(spark):
    rows = [(1, "a b a"), (2, "a c"), (3, "b a")]
    idx = {r.token: r for r in rt.inverted_index(
        _docs(spark, rows), postings_cap=2, top_k=None
    ).collect()}
    assert idx["a"].df_docs == 3 and idx["a"].cf == 4
    assert idx["a"].postings_head == "1,2"  # capped at 2, ascending
    assert idx["b"].df_docs == 2 and idx["b"].postings_head == "1,3"
    assert idx["c"].df_docs == 1 and idx["c"].cf == 1


# ---------------------------------------------------------------- stratified

def test_stratified_exact_counts(spark):
    rows = [(i, "s1" if i < 40 else "s2") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = sp.stratified_exact_sample(df, "source", "doc_id").collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
    for src, n_total in (("s1", 40), ("s2", 60)):
        rate_u32 = int(hashlib.md5(src.encode()).hexdigest()[:8], 16)
        rate = 0.25 + 0.50 * (rate_u32 / 2**32)
        expect = math.ceil(rate * n_total)
        assert len(by_src[src]) == expect, src
        assert all(r.target_n == expect for r in by_src[src])
        # ranks are exactly 1..expect
        assert sorted(r.samp_rank for r in by_src[src]) == list(
            range(1, expect + 1)
        )


def test_stratified_sample_is_content_stable(spark):
    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r.doc_id for r in sp.stratified_exact_sample(df, "source", "doc_id").collect()}
    b = {
        r.doc_id
        for r in sp.stratified_exact_sample(
            df.repartition(7), "source", "doc_id"
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------- packing

def test_length_bucket_packing_invariants(spark):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(
        [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 150, 7, 9, 17]
    )]
    out = cp.length_bucket_packing(
        _docs(spark, rows), max_tokens=64
    ).collect()
    assert out
    total_docs = sum(r.n_docs for r in out)
    assert total_docs == len(rows)
    for r in out:
        assert r.padded_tokens >= r.real_tokens
        assert 0.0 <= r.waste_frac < 1.0
        # bucket b pads to 2^(b+1); tokens in (2^b, 2^(b+1)] would halve
        # waste — the invariant is padded = n_docs * 2^(b+1)
        assert r.padded_tokens == r.n_docs * (1 << (r.bucket + 1))
        # batch token budget: padded never exceeds max_tokens unless a
        # single doc alone overflows it
        if r.n_docs > 1:
            assert r.padded_tokens <= 64


def test_length_bucket_batches_are_full_except_last(spark):
    # 10 docs of 7 tokens: bucket=2, padded=8, 4 docs/batch at 32 tokens
    rows = [(i, " ".join(["t"] * 7)) for i in range(10)]
    out = sorted(
        cp.length_bucket_packing(_docs(spark, rows), max_tokens=32).collect(),
        key=lambda r: r.batch_id,
    )
    assert [r.n_docs for r in out] == [4, 4, 2]


# ---------------------------------------------------------------- pagerank

def test_token_pagerank_sanity(spark):
    rows = [
        (1, "hub a hub b hub c"),
        (2, "a hub b hub"),
        (3, "c hub"),
    ]
    ranks = {
        r.token: r.rank
        for r in gr.token_pagerank(
            _docs(spark, rows), n_iter=3, top_k=None
        ).collect()
    }
    assert all(v > 0 for v in ranks.values())
    # leaked-mass variant: total rank never exceeds 1
    assert sum(ranks.values()) <= 1.0 + 1e-6
    # 'hub' receives edges from everything — it must rank highest
    assert max(ranks, key=ranks.get) == "hub"


def test_token_pagerank_uniform_on_symmetric_cycle(spark):
    # a -> b -> c -> a : perfectly symmetric, ranks stay uniform
    rows = [(1, "a b c a")]
    ranks = [
        r.rank
        for r in gr.token_pagerank(
            _docs(spark, rows), n_iter=3, top_k=None
        ).collect()
    ]
    assert len(ranks) == 3
    assert max(ranks) - min(ranks) < 1e-9


# ---------------------------------------------------------------- audio

def test_audio_frame_energy_matches_numpy(spark):
    rows = [(1, "abcd" * 40), (2, "z"), (3, "")]
    media = mm.attach_binary(_docs(spark, rows), "doc_id", "text")
    got = {r.media_id: r for r in mm.audio_frame_energy(
        media, frame_bytes=64
    ).collect()}
    for doc_id, text in rows:
        buf = np.frombuffer(text.encode(), dtype=np.uint8)
        if buf.size == 0:
            assert doc_id not in got
            continue
        sq = (buf.astype(np.int64) - 128) ** 2
        n_frames = -(-buf.size // 64)
        pad = n_frames * 64 - buf.size
        per = np.concatenate([sq, np.zeros(pad, dtype=np.int64)]).reshape(
            n_frames, 64
        ).sum(axis=1)
        r = got[doc_id]
        assert r.n_frames == n_frames
        assert r.total_energy == per.sum()
        assert r.peak_frame_energy == per.max()
        assert abs(r.mean_frame_energy - per.sum() / n_frames) < 1e-9
