"""Wave 89: Hill tail index and log-normal doc-length fit — brute-force
references under the integer-micros log convention."""

from __future__ import annotations

import math

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.textstats import (
    doclen_lognormal_fit,
    hill_tail_alpha,
)


def _docs_zipf(spark, n_tokens=12):
    """Vocabulary w0..w{n-1} with Zipf-ish counts c_i = 2^(n-i)."""
    texts = []
    for i in range(n_tokens):
        texts.extend([f"w{i:02d}"] * (2 ** (n_tokens - i)))
    # pack 50 tokens per doc
    rows = [
        (d, " ".join(texts[d * 50 : (d + 1) * 50]))
        for d in range((len(texts) + 49) // 50)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), texts


def test_hill_matches_reference(spark):
    df, texts = _docs_zipf(spark)
    k = 5
    out = hill_tail_alpha(df, "doc_id", "text", k=k).collect()[0]
    from collections import Counter

    counts = sorted(Counter(texts).values(), reverse=True)
    cmin = counts[k]
    sum_log = sum(round(math.log(c / cmin) * 1e6) for c in counts[:k]) / 1e6
    assert out.k == k
    assert out.c_threshold == cmin
    assert out.sum_log == pytest.approx(sum_log, abs=1e-9)
    assert out.alpha == pytest.approx(k / sum_log, abs=1e-9)
    # counts double each rank: ln-ratios ~ ln2 * (k..1); alpha = k/sum
    assert 0.3 < out.alpha < 0.6


def test_hill_all_tied_null_alpha(spark):
    df = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(4)], "doc_id long, text string"
    )
    rows = hill_tail_alpha(df, "doc_id", "text", k=3).collect()
    assert len(rows) == 1 and rows[0].alpha is None  # every count ties


def test_hill_vocab_smaller_than_k_null_row(spark):
    # <= k token types: no (k+1)-th threshold exists. The r8 advice fix
    # guarantees ONE (k, NULL, NULL, NULL) row instead of a zero-row
    # frame that crashed collect()[0]-style consumers.
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    rows = hill_tail_alpha(df, "doc_id", "text", k=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k == 10
    assert r.c_threshold is None and r.sum_log is None and r.alpha is None


def test_doclen_lognormal_reference(spark):
    lens = [1, 2, 4, 8, 16, 32, 64]
    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate(lens)]
    rows.append((99, ""))  # zero tokens -> excluded, counted in n_empty
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = doclen_lognormal_fit(df, "doc_id", "text").collect()[0]
    ms = [round(math.log(n) * 1e6) for n in lens]
    n = len(ms)
    mu = sum(ms) / 1e6 / n
    var = (n * sum(m * m for m in ms) - sum(ms) ** 2) / (1e6 * 1e6 * n * (n - 1))
    assert out.n_docs == n and out.n_empty == 1
    assert out.mu_log_len == pytest.approx(mu, abs=1e-12)
    assert out.sigma_log_len == pytest.approx(math.sqrt(var), abs=1e-12)
    # powers of two: mu = 3*ln2 exactly (up to micros quantization)
    assert out.mu_log_len == pytest.approx(3 * math.log(2), abs=1e-5)


def test_doclen_partition_independent(spark):
    rows = [(i, " ".join(["t"] * (i % 17 + 1))) for i in range(60)]
    a = doclen_lognormal_fit(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    b = doclen_lognormal_fit(
        spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    ).collect()
    assert repr(a) == repr(b)
