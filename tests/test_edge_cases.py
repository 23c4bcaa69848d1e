"""Degenerate-input sweep: empty frames, single rows, empty/whitespace
text, zero vectors — the inputs that break sequence()/slice() arithmetic,
argmin ties, and division if an operator hasn't guarded them."""

from __future__ import annotations

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators import corpus as cp
from hmpps_digital_prison_reporting_glue_poc_spark.operators import dedup as dd
from hmpps_digital_prison_reporting_glue_poc_spark.operators import mixing as mx
from hmpps_digital_prison_reporting_glue_poc_spark.operators import similarity as sim
from hmpps_digital_prison_reporting_glue_poc_spark.operators import textstats as ts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_ops_on_empty_frame(spark):
    empty = _docs(spark, [])
    assert dd.exact_dup_groups(empty, "doc_id", "text").count() == 0
    assert dd.minhash_signatures(empty, "doc_id", "text").count() == 0
    assert dd.jaccard_pairs(empty, "doc_id", "text", max_df=5).count() == 0
    assert dd.simhash(empty, "doc_id", "text").count() == 0
    assert (
        dd.minhash_jaccard_estimates(empty, "doc_id", "text").count() == 0
    )


def test_text_ops_on_empty_and_whitespace_text(spark):
    df = _docs(spark, [(1, ""), (2, "   "), (3, "one")])
    stats = {r.doc_id: r for r in ts.token_stats(df, "doc_id", "text").collect()}
    assert stats[1].n_tokens == 0 and stats[2].n_tokens == 0
    assert stats[3].n_tokens == 1
    # shingles of sub-k docs: one whole-text shingle, never negative slices
    sigs = dd.minhash_signatures(df, "doc_id", "text", num_hashes=2)
    assert sigs.count() == 3
    # n-grams shorter than n contribute nothing (not reversed sequences)
    grams = cp.cross_doc_ngram_coverage(df, n=8)
    assert grams.count() == 0


def test_chunking_and_packing_tiny_docs(spark):
    df = _docs(spark, [(1, "a b"), (2, "")])
    chunks = cp.chunk_tokens(df, "doc_id", "text", size=32, stride=24)
    got = {r.doc_id: r.n_chunk_tokens for r in chunks.collect()}
    assert got == {1: 2}  # doc 2 has no tokens -> no chunk rows


def test_mixing_ops_single_group(spark):
    one = spark.createDataFrame(
        [(1, "a b c", "only")], "doc_id long, text string, source string"
    )
    w = mx.domain_mix_weights(one).collect()[0]
    assert w.token_share == 1.0
    assert w.upsample_factor == 1.0 and w.weight_vs_max == 1.0
    # dsir with zero target docs: tgt_c = 0 everywhere, still defined
    df = spark.createDataFrame(
        [(1, "x y", False), (2, "y z", False)],
        "doc_id long, text string, is_target boolean",
    )
    rows = mx.dsir_importance_weights(df).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.dsir_logweight is not None


def test_similarity_ops_single_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    # LSH over one vector: no pairs, no crash
    assert sim.hyperplane_lsh_pairs_md5(
        spark, df, n_bits=4, n_tables=2
    ).count() == 0
    code = sim.pq_encode(spark, df, n_subspaces=2, n_centroids=4).collect()
    assert len(code) == 1
    # ivfpq: query == entire corpus of one
    got = sim.ivfpq_topk(
        spark, df, df, k=3, n_lists=2, nprobe=2, n_subspaces=2, n_centroids=4
    ).collect()
    assert len(got) == 1 and got[0].neighbor_id == 1 and got[0].rank == 1


def test_global_sort_rank_single_row_and_ties(spark):
    one = spark.createDataFrame(
        [(7, "aa")], "doc_id long, sort_key string"
    )
    r = cp.global_sort_rank(one, key_col="sort_key").collect()[0]
    assert r.shuffle_rank == 1
    # identical keys: rank decided by id, still a permutation
    dup = spark.createDataFrame(
        [(1, "k"), (2, "k"), (3, "k")], "doc_id long, sort_key string"
    )
    got = {
        r.doc_id: r.shuffle_rank
        for r in cp.global_sort_rank(dup, key_col="sort_key").collect()
    }
    assert got == {1: 1, 2: 2, 3: 3}


def test_dedup_against_empty_store(spark):
    store = spark.createDataFrame([], "doc_id long, fingerprint string")
    incoming = _docs(spark, [(5, "x"), (6, "x")])
    kept = dd.dedup_against_store(incoming, store).collect()
    assert [r.doc_id for r in kept] == [5]


def test_media_scene_cuts_multibyte_oracle_parity(spark, tmp_path):
    """chunk_media slices UTF-8 BYTES; the DuckDB oracle must chunk the
    same bytes (via hex(encode(text)) slices), not characters — on
    multibyte text char-sliced frames would disagree on both geometry
    and cut decisions. All shipped testdata is ASCII, so this pins the
    non-ASCII case explicitly."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry_mod

    d = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["héllo wörld " * 20, "日本語のテキスト" * 30, "ascii " * 15],
            "source": ["a", "a", "b"],
        }
    ).to_parquet(f"{d}/documents.parquet")
    sdf = (
        entry_mod.queries()["media_scene_cuts"](spark, d)
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    odf = (
        con.sql(entry_mod.oracle_sql()["media_scene_cuts"])
        .df()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    con.close()
    assert sdf.astype(str).equals(odf[sdf.columns].astype(str))


def test_wave19_ops_on_degenerate_text(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import graph as gr
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import retrieval as rt

    df = _docs(spark, [(1, ""), (2, "one"), (3, "a b")])
    # dup spans: sub-window docs contribute one whole-text span each
    spans = {r.doc_id: r.n_windows for r in dd.dup_span_stats(
        df, window_tokens=8
    ).collect()}
    assert spans == {1: 1, 2: 1, 3: 1}
    # inverted index: empty text contributes nothing
    idx = rt.inverted_index(df, top_k=None).collect()
    assert {r.token for r in idx} == {"one", "a", "b"}
    # bloom over a corpus with no n-grams -> empty filter; probing with
    # it flags nothing
    bits = rt.bloom_bit_positions(_docs(spark, [(9, "x y")]), ngram_n=3)
    assert bits.count() == 0
    probed = rt.bloom_probe_docs(df, bits, ngram_n=3).collect()
    assert all(r.n_flagged == 0 for r in probed)
    # pagerank on a corpus with no bigrams -> empty rank table
    assert gr.token_pagerank(
        _docs(spark, [(1, "solo"), (2, "")]), top_k=None
    ).count() == 0


def test_wave19_packing_and_sampling_degenerate(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import sampling as sp

    # packing drops zero-token docs; single 1-token doc -> bucket 0
    out = cp.length_bucket_packing(_docs(spark, [(1, "w"), (2, "")]))
    rows = out.collect()
    assert len(rows) == 1 and rows[0].bucket == 0 and rows[0].n_docs == 1
    # stratified sampling on a 1-row stratum keeps that row (ceil >= 1)
    one = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    kept = sp.stratified_exact_sample(one, "source", "doc_id").collect()
    assert len(kept) == 1 and kept[0].target_n == 1
    # weighted top-k with k > n returns all positive-weight rows
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -1)], "doc_id long, w long"
    )
    got = sp.weighted_topk_sample(df, "w", "doc_id", k=10).collect()
    assert [r.doc_id for r in got] == [1]


def test_wave20_ops_degenerate_vectors(spark):
    # int8 audit: zero vector excluded; uniform vector saturates fully
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [0.5] * 4)],
        "vec_id long, embedding array<double>",
    )
    rows = sim.int8_quant_stats(df).collect()
    assert len(rows) == 1
    assert rows[0].vec_id == 2 and rows[0].n_saturated == 4
    assert rows[0].sse == 0.0  # all elements exactly at the scale point
    # matryoshka: zero vector excluded
    m = sim.matryoshka_prefix_norms(
        spark.createDataFrame(
            [(1, [0.0] * 64)], "vec_id long, embedding array<double>"
        )
    )
    assert m.count() == 0


def test_wave21_ops_degenerate_inputs(spark):
    # BPE: single-char words contribute no pairs
    assert ts.bpe_merge_candidates(
        _docs(spark, [(1, "a b c")]), top_k=10
    ).count() == 0
    # decile audit on a 1-row group: one decile, exact stats
    one = spark.createDataFrame(
        [(1, "s", 7, 42)], "doc_id long, source string, score long, sig long"
    )
    r = mx.quality_decile_audit(one, "score", "sig", "source", "doc_id").collect()
    assert len(r) == 1 and r[0].n_docs == 1 and r[0].mean_signal == 42.0
