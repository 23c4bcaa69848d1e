"""Data-selection / mixture operators (operators/mixing.py) and the
wave-14 corpus/text additions: DSIR importance weights, domain mix
factors, deterministic weighted sampling, cross-doc n-gram coverage,
tokenizer fertility."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators import corpus as cp
from hmpps_digital_prison_reporting_glue_poc_spark.operators import mixing as mx
from hmpps_digital_prison_reporting_glue_poc_spark.operators import textstats as ts


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_dsir_weights_sign_and_counts(spark):
    # target docs use 'tgt' tokens, background docs 'bg' tokens; a doc made
    # of target-exclusive tokens must score positive, background-exclusive
    # negative, and a 50/50 doc in between.
    df = spark.createDataFrame(
        [
            (0, "tgt tgt tgt", True),
            (1, "bg bg bg", False),
            (2, "tgt bg", False),
        ],
        "doc_id long, text string, is_target boolean",
    )
    got = {
        r.doc_id: r for r in mx.dsir_importance_weights(df).collect()
    }
    assert got[0].n_tokens == 3 and got[1].n_tokens == 3
    assert got[0].dsir_logweight > 0 > got[1].dsir_logweight
    assert got[1].dsir_logweight < got[2].dsir_logweight < got[0].dsir_logweight
    # hand-check doc 0: token 'tgt' has tgt_c=3, all_c=4; totals: all=8,
    # tgt=3, vocab=2. term = ln((4 * 10) / (5 * 5)) rounded to 6 dp, x3.
    term = round(math.log((3 + 1) * (8 + 2) / ((4 + 1) * (3 + 2))), 6)
    assert abs(got[0].dsir_logweight - 3 * term) < 1e-9


def test_domain_mix_weights_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", "big"), (2, "a b c d", "big"), (3, "a b", "small")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in mx.domain_mix_weights(df).collect()}
    assert got["big"].n_tokens == 8 and got["small"].n_tokens == 2
    assert got["big"].token_share == 0.8
    assert got["small"].upsample_factor == math.sqrt(10 / 2)
    assert got["small"].weight_vs_max == math.sqrt(2 / 8)
    assert got["big"].weight_vs_max == 1.0


def test_weighted_sample_matches_hash_formula_and_is_stable(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}", f"src{i % 3}") for i in range(300)],
        "doc_id long, text string, source string",
    )
    kept = {r.doc_id: r for r in mx.weighted_sample(df).collect()}
    # exact membership per the published formula
    for i in range(300):
        rate = _u32(f"src{i % 3}") // 2 + (1 << 30)
        assert (_u32(f"s:{i}") < rate) == (i in kept)
        if i in kept:
            assert kept[i].rate_u32 == rate
    # rates live in [0.25, 0.75) of the u32 space
    for r in kept.values():
        assert (1 << 30) <= r.rate_u32 < (1 << 30) + (1 << 31)
    # partition-independence: same decision set after a reshuffle
    re = {r.doc_id for r in mx.weighted_sample(df.repartition(7)).collect()}
    assert re == set(kept)


def test_cross_doc_ngram_coverage(spark):
    # doc 1 and 2 identical -> every 3-gram instance is cross-duplicated;
    # doc 3 unique -> zero coverage; doc 4 too short -> no row.
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c d"),
            (3, "p q r s t"),
            (4, "x y"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in cp.cross_doc_ngram_coverage(df, n=3).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1].n_ngrams == 2 and got[1].n_dup_ngrams == 2
    assert got[1].cross_dup_frac == 1.0
    assert got[3].n_ngrams == 3 and got[3].cross_dup_frac == 0.0


def test_cross_doc_ngram_coverage_within_doc_repeat_not_cross(spark):
    # a doc repeating ITS OWN n-gram is not cross-duplicated
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "z z z z")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r for r in cp.cross_doc_ngram_coverage(df, n=2).collect()
    }
    assert got[1].n_dup_ngrams == 0 and got[2].n_dup_ngrams == 0


def test_tokenizer_fertility_exact(spark):
    df = spark.createDataFrame(
        [(1, "ab cd", "en"), (2, "efgh", "en"), (3, "xy", "fr")],
        "doc_id long, text string, lang string",
    )
    got = {r.lang: r for r in ts.tokenizer_fertility(df).collect()}
    # en: tokens 2+1=3, chars 5+4=9; ascii -> bytes == chars
    assert got["en"].n_tokens == 3 and got["en"].n_chars == 9
    assert got["en"].n_bytes == 9
    assert got["en"].chars_per_token == 3.0
    assert got["fr"].n_tokens == 1 and got["fr"].bytes_per_token == 2.0


def test_tokenizer_fertility_multibyte(spark):
    # non-ascii text: bytes > chars (utf-8), exact integer accounting
    df = spark.createDataFrame(
        [(1, "héllo wörld", "de")], "doc_id long, text string, lang string"
    )
    r = ts.tokenizer_fertility(df).collect()[0]
    assert r.n_chars == 11
    assert r.n_bytes == 13  # é and ö are 2 bytes each
    assert r.n_tokens == 2


def test_curriculum_interleave_uniform_mix(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import (
        curriculum_interleave,
    )

    # 8 docs, scores 0..7, 4 bins of 2 -> window [0..3] holds one per bin
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "doc_id long, q double"
    )
    out = sorted(
        (r.pos, r.doc_id, r.bin)
        for r in curriculum_interleave(df, "doc_id", "q", n_bins=4).collect()
    )
    assert [p for p, _d, _b in out] == list(range(8))  # pos is a permutation
    first_window_bins = {b for p, _d, b in out if p < 4}
    assert first_window_bins == {0, 1, 2, 3}
    # interleave pattern: easiest doc first, then one from each harder bin
    assert [d for _p, d, _b in out[:4]] == [0, 2, 4, 6]
    assert [d for _p, d, _b in out[4:]] == [1, 3, 5, 7]


def test_curriculum_interleave_uneven_bins(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import (
        curriculum_interleave,
    )

    df = spark.createDataFrame(
        [(i, float(i % 5) + i * 0.01) for i in range(10)],
        "doc_id long, q double",
    )
    out = curriculum_interleave(df, "doc_id", "q", n_bins=3).collect()
    poss = sorted(r.pos for r in out)
    assert poss == list(range(10))  # permutation even when 10 % 3 != 0
    bins = {r.bin for r in out}
    assert bins == {0, 1, 2}


def test_negative_samples_deterministic_and_excludes_self(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.sampling import (
        negative_samples,
    )

    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    a = sorted(
        (r.anchor_id, r.sample_idx, r.negative_id)
        for r in negative_samples(df, "doc_id", k=3).collect()
    )
    b = sorted(
        (r.anchor_id, r.sample_idx, r.negative_id)
        for r in negative_samples(df, "doc_id", k=3).collect()
    )
    assert a == b                           # deterministic across runs
    assert all(anc != neg for anc, _i, neg in a)
    assert len(a) <= 20 * 3
    anchors = {anc for anc, _i, _n in a}
    assert len(anchors) >= 19               # nearly every anchor drew
    c = sorted(
        (r.anchor_id, r.sample_idx, r.negative_id)
        for r in negative_samples(df, "doc_id", k=3, seed="other").collect()
    )
    assert a != c                           # seed changes the draw


def test_decayed_item_counts_halving(spark):
    import datetime

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
        decayed_item_counts,
    )

    ref = "2024-02-01 00:00:00"
    t = datetime.datetime(2024, 2, 1)
    rows = [
        # item A: one event today (w=1), one 7 days old (w=0.5),
        #         one 14 days old (w=0.25)
        (1, "A", t - datetime.timedelta(hours=1)),
        (2, "A", t - datetime.timedelta(days=7, hours=1)),
        (3, "A", t - datetime.timedelta(days=14, hours=1)),
        # item B: one extremely old event -> capped exponent, ~0 weight
        (4, "B", t - datetime.timedelta(days=3650)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, item string, ts timestamp"
    )
    out = {
        r.item: (r.n_events, r.decayed_count)
        for r in decayed_item_counts(
            df, "item", t_ref=ref, half_life_days=7
        ).collect()
    }
    assert out["A"] == (3, 1.75)
    assert out["B"][0] == 1 and out["B"][1] == 2.0 ** -50
