"""Wave-25 operators: cross-source duplicate leaks, boilerplate prefix
clusters, winsorized means — planted-case verification (the synthetic
corpus contains no cross-source exact dupes, so the oracle row for
cross_source_dups is empty; these tests carry the semantics)."""

from __future__ import annotations

from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
    boilerplate_prefix_clusters,
    cross_source_dup_audit,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import (
    winsorized_signal_means,
)


def test_cross_source_dup_audit_finds_planted_leak(spark):
    rows = [
        (1, "leaked page body", "crawl_a"),
        (2, "leaked page body", "crawl_b"),   # same content, other source
        (3, "leaked page body", "crawl_a"),   # third copy, same source as 1
        (4, "unique body one", "crawl_a"),
        (5, "same-source dup", "crawl_b"),
        (6, "same-source dup", "crawl_b"),    # dup but single source: NOT a leak
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = cross_source_dup_audit(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_sources == 2 and r.n_docs == 3 and r.min_doc_id == 1
    assert r.sources == "crawl_a,crawl_b"


def test_boilerplate_prefix_clusters_planted(spark):
    header = "terms of service apply to this site please"
    rows = [
        (1, header + " alpha beta"),
        (2, header + " gamma delta"),   # same 8-token header, different body
        (3, "completely different text here now ok fine yes"),
        (4, "dup dup"),                 # short docs cluster on whole text
        (5, "dup dup"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.min_doc_id: r for r in boilerplate_prefix_clusters(
        df, prefix_tokens=8, min_docs=2
    ).collect()}
    assert set(out) == {1, 4}
    assert out[1].n_docs == 2 and out[1].all_identical is False  # true boilerplate
    assert out[4].n_docs == 2 and out[4].all_identical is True   # pure dupes


def test_winsorized_mean_resists_outliers(spark):
    # 18 docs near 100 plus two garbage outliers (0 and 100000)
    rows = [(i, "s", 100 + i) for i in range(18)] + [
        (100, "s", 0),
        (101, "s", 100000),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, sig long")
    r = winsorized_signal_means(
        df, "sig", "source", "doc_id", trim_rank_frac=0.1
    ).collect()[0]
    # k = ceil(0.1*20) = 2: cuts at ranks 2 and 19 -> values 100 and 117
    assert r.lo_cut == 100 and r.hi_cut == 117
    # raw mean is dragged to ~5063; winsorized stays in the data's range
    assert r.raw_mean > 5000
    assert 100 <= r.winsorized_mean <= 118
    # exact: clamp and average by hand
    vals = sorted(v for _, _, v in rows)
    clamped = [min(max(v, 100), 117) for v in vals]
    assert r.winsorized_mean == sum(clamped) / len(clamped)


def test_weak_label_vote_semantics(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.mixing import weak_label_vote

    letters = "abcdefghij"
    rows = [
        # 35 distinct LETTER-ONLY tokens: LF1 +1, diversity 1.0 -> LF2 +1,
        # zero digit chars -> LF3 +1
        (1, " ".join("t" + letters[i % 10] * (i // 10 + 1) for i in range(35))),
        # 5 tokens: LF1 -1; all same token: diversity 0.2 -> LF2 -1; digits 0 -> LF3 +1
        (2, "x x x x x"),
        # 15 tokens (middle band -> abstain), diverse, digit-heavy (>30%)
        (3, " ".join("99999" if i % 2 else f"t{i}" for i in range(15))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in weak_label_vote(df).collect()}
    assert (got[1].lf_length, got[1].lf_diversity, got[1].lf_digits) == (1, 1, 1)
    assert got[1].majority_label == "keep" and got[1].conflict is False
    assert (got[2].lf_length, got[2].lf_diversity, got[2].lf_digits) == (-1, -1, 1)
    assert got[2].majority_label == "drop" and got[2].conflict is True
    assert got[3].lf_length == 0 and got[3].lf_digits == -1


def test_token_gini_extremes(spark):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import (
        token_gini_concentration,
    )

    # perfectly uniform usage: G = 0 (rank formula gives exactly 0)
    uniform = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    r = token_gini_concentration(uniform).collect()[0]
    assert r.n_vocab == 4 and abs(r.token_gini) < 1e-12
    # extreme concentration: one token dominates -> G near (n-1)/n-ish
    skewed = spark.createDataFrame(
        [(1, "hub " * 96 + "x y z w")], "doc_id long, text string"
    )
    r2 = token_gini_concentration(skewed).collect()[0]
    assert r2.token_gini > 0.7
    # exact check vs closed form
    freqs = sorted([96, 1, 1, 1, 1])
    n = len(freqs)
    rf = sum((i + 1) * f for i, f in enumerate(freqs))
    expect = 2 * rf / (n * sum(freqs)) - (n + 1) / n
    assert abs(r2.token_gini - expect) < 1e-12
