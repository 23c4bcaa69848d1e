"""Corpus-preparation operators (operators/corpus.py): n-gram stats,
decontamination, sequence packing, deterministic splits, repetition."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators import corpus as cp


def test_ngram_counts_and_short_doc_guard(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b"),
            (2, "a b"),
            (3, "solo"),  # shorter than n: contributes NO bigrams
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.ngram: (r.n_docs, r.n_occurrences)
        for r in cp.ngram_counts(df, n=2).collect()
    }
    assert got == {"a b": (2, 3), "b c": (1, 1), "c a": (1, 1)}


def test_ngram_counts_topk_is_total_ordered(spark):
    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "p q")], "doc_id long, text string"
    )
    rows = cp.ngram_counts(df, n=2, top_k=2).collect()
    # (x y: 2) first, then tie between 'p q' and 'y x' broken by ngram asc
    assert [r.ngram for r in rows] == ["x y", "p q"]


def test_contamination_pairs(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text with no overlap at all here")],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "quick brown fox jumps over the moon tonight")],
        "doc_id long, text string",
    )
    got = {
        (r.train_id, r.eval_id): r.n_shared
        for r in cp.contamination_pairs(train, evalset, n=5).collect()
    }
    # shared 5-grams: "quick brown fox jumps over" and "brown fox jumps over the"
    assert got == {(1, 100): 2}


def test_pack_sequences_bin_arithmetic(spark):
    df = spark.createDataFrame(
        [("s", 1, 300), ("s", 2, 300), ("s", 3, 500), ("t", 4, 100)],
        "source string, doc_id long, n_tokens long",
    )
    got = {
        r.doc_id: (r.bin_id, r.bin_offset)
        for r in cp.pack_sequences(df, budget=512).collect()
    }
    # doc1 starts at 0 -> bin 0 offset 0; doc2 starts at 300 -> bin 0
    # offset 300 (straddles into bin 1); doc3 starts at 600 -> bin 1
    # offset 88; source t restarts at 0.
    assert got == {1: (0, 0), 2: (0, 300), 3: (1, 88), 4: (0, 0)}


def test_split_assign_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    a = {r.doc_id: r.split for r in cp.split_assign(df).collect()}
    b = {r.doc_id: r.split for r in cp.split_assign(df).collect()}
    assert a == b  # content-stable across runs
    counts = {s: sum(1 for v in a.values() if v == s) for s in ("train", "val", "test")}
    assert sum(counts.values()) == 1000
    assert counts["train"] > 700  # ~80%
    assert 40 < counts["val"] < 180 and 40 < counts["test"] < 180

    # matches the documented md5-bucket formula exactly
    def expected(i):
        bucket = int(hashlib.md5(f"v1{i}".encode()).hexdigest()[:8], 16) / 2**32
        return "train" if bucket < 0.8 else ("val" if bucket < 0.9 else "test")

    assert all(a[i] == expected(i) for i in range(0, 1000, 37))


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "u v w x")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in cp.repetition_stats(df, n=2).collect()}
    # doc1 bigrams: [a b, b a, a b, b a, a b] -> 5 total, 2 distinct, top 3
    assert (got[1].n_ngrams, got[1].n_distinct_ngrams, got[1].top_ngram_count) == (5, 2, 3)
    assert got[1].dup_ngram_frac == pytest.approx(3 / 5)
    assert (got[2].n_ngrams, got[2].n_distinct_ngrams) == (3, 3)
    assert got[2].dup_ngram_frac == 0.0


def test_chunk_tokens_geometry(spark):
    # 10 tokens, size 4, stride 3 -> starts 0,3,6,9: three full(ish) chunks
    # and a 1-token tail. Adjacent chunks overlap by size - stride = 1.
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        cp.chunk_tokens(df, size=4, stride=3).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.doc_id for r in rows] == [1, 1, 1, 1]  # empty doc: no rows
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in rows] == [4, 4, 4, 1]
    # chunk 1 covers tokens 3..6 — overlaps chunk 0 (0..3) on token 3
    expected = hashlib.md5(b"t3 t4 t5 t6").hexdigest()
    assert rows[1].chunk_md5 == expected


def test_chunk_tokens_rejects_bad_geometry(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cp.chunk_tokens(df, size=0, stride=3)
    with pytest.raises(ValueError):
        cp.chunk_tokens(df, size=4, stride=0)


def test_corpus_ops_stay_in_codegen(spark):
    # No Python UDFs anywhere: plans must be free of BatchEvalPython /
    # ArrowEvalPython nodes (100 TB hot-path contract).
    df = spark.createDataFrame([(1, "a b c", "s", 3)],
                               "doc_id long, text string, source string, n_tokens long")
    for frame in (
        cp.ngram_counts(df, n=2),
        cp.chunk_tokens(df),
        cp.pack_sequences(df),
        cp.split_assign(df),
        cp.repetition_stats(df),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_line_dedup_corpus_wide_first_occurrence(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "header\nalpha\nfooter"),
            (2, "header\nbeta\nfooter"),   # header+footer are repeats
            (3, "header\nalpha\ngamma"),   # alpha repeat too
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert out[1].text == "header\nalpha\nfooter" and out[1].n_kept == 3
    assert out[2].text == "beta" and out[2].n_kept == 1
    assert out[3].text == "gamma" and out[3].n_kept == 1
    assert out[3].n_lines == 3


def test_line_dedup_all_dup_doc_and_drop_option(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [(1, "x\ny"), (2, "x\ny")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert out[2].text == "" and out[2].n_kept == 0
    kept = line_dedup(docs, keep_empty_docs=False)
    assert [r.doc_id for r in kept.collect()] == [1]


def test_line_dedup_preserves_within_doc_order(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [(1, "z\na\nm"), (2, "m\nq\nz")], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in line_dedup(docs).collect()}
    assert out[1] == "z\na\nm"  # original order, NOT sorted
    assert out[2] == "q"
