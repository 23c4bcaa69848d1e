"""Wave 58: lead-lag cross-correlation (two-series integer centering)
and Flesch reading-ease — brute-force goldens, lead detection, and
degenerate-text handling."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    ccf_daily,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.textstats import (
    flesch_reading_scores,
)


def _frame(spark, vals, start=0):
    d0 = datetime.date(2024, 1, 1)
    rows = [
        (d0 + datetime.timedelta(days=start + i), v)
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "day date, x long")


def _brute_ccf(sx, sy, k):
    """Full-series-variance-normalized CCF on dict day->value series."""
    import math

    mx = sum(sx.values()) / len(sx)
    my = sum(sy.values()) / len(sy)
    dx = sum((v - mx) ** 2 for v in sx.values())
    dy = sum((v - my) ** 2 for v in sy.values())
    if dx <= 0 or dy <= 0:
        return None
    num = sum(
        (sx[d] - mx) * (sy[d + k] - my) for d in sx if d + k in sy
    )
    return num / math.sqrt(dx * dy)


def test_ccf_detects_known_lead(spark):
    """y is x shifted forward by 2 days: the CCF peaks at lag +2."""
    x = [5, 9, 2, 8, 1, 7, 3, 6, 4, 8]
    xf = _frame(spark, x)
    yf = _frame(spark, x, start=2)  # same values, two days later
    out = {r.lag: r.ccf for r in ccf_daily(xf, yf, max_lag=4).collect()}
    assert out[2] == pytest.approx(1.0)
    best = max((v for v in out.values() if v is not None))
    assert best == out[2]


def test_ccf_brute_force_asymmetric(spark):
    x = [3, 1, 4, 1, 5, 9, 2, 6]
    y = [2, 7, 1, 8, 2, 8, 1, 8]
    xf, yf = _frame(spark, x), _frame(spark, y)
    sx = {i: v for i, v in enumerate(x)}
    sy = {i: v for i, v in enumerate(y)}
    out = {r.lag: r for r in ccf_daily(xf, yf, max_lag=3).collect()}
    assert len(out) == 7  # lags -3..3
    for k in range(-3, 4):
        assert out[k].ccf == pytest.approx(_brute_ccf(sx, sy, k)), k
    # asymmetry: ccf(k) != ccf(-k) in general
    assert out[1].ccf != pytest.approx(out[-1].ccf)


def test_ccf_flat_series_null(spark):
    xf = _frame(spark, [4, 4, 4, 4])
    yf = _frame(spark, [1, 2, 3, 4])
    out = ccf_daily(xf, yf, max_lag=2).collect()
    assert all(r.ccf is None for r in out)


def test_ccf_disjoint_day_ranges_zero_pairs(spark):
    xf = _frame(spark, [1, 2, 3])
    yf = _frame(spark, [4, 5, 6], start=100)
    out = ccf_daily(xf, yf, max_lag=2).collect()
    assert all(r.n_pairs == 0 and r.ccf is None for r in out)


def test_flesch_simple_text_golden(spark):
    """'The cat sat on the mat.' -> 6 words, 1 sentence, 6 vowel groups
    -> 206.835 - 1.015*6 - 84.6*1 = 116.145."""
    df = spark.createDataFrame(
        [(1, "The cat sat on the mat.")], "id long, text string"
    )
    row = flesch_reading_scores(df, "id", "text").collect()[0]
    assert row.n_words == 6
    assert row.n_sentences == 1
    assert row.n_syllable_groups == 6
    assert row.flesch == pytest.approx(206.835 - 1.015 * 6 - 84.6 * 1)


def test_flesch_multi_sentence_and_vowel_runs(spark):
    """'Beautiful queue. Ok!? Right.' — vowel GROUPS: eau-i-u (beautiful
    has eau,i,u = 3), ueue (queue: ueue = 1), o (ok), i (right) = 6;
    sentences: '.', '!?', '.' -> 3 runs; words 4."""
    df = spark.createDataFrame(
        [(1, "Beautiful queue. Ok!? Right.")], "id long, text string"
    )
    row = flesch_reading_scores(df, "id", "text").collect()[0]
    assert row.n_words == 4
    assert row.n_sentences == 3
    assert row.n_syllable_groups == 6


def test_flesch_unpunctuated_floors_sentences(spark):
    df = spark.createDataFrame(
        [(1, "no punctuation here at all")], "id long, text string"
    )
    row = flesch_reading_scores(df, "id", "text").collect()[0]
    assert row.n_sentences == 1
    assert row.flesch is not None


def test_flesch_empty_text_null(spark):
    df = spark.createDataFrame([(1, "")], "id long, text string")
    row = flesch_reading_scores(df, "id", "text").collect()[0]
    assert row.n_words == 0
    assert row.flesch is None


def test_flesch_readability_orders_sensibly(spark):
    """Long-word, long-sentence text scores lower than short prose."""
    easy = "The dog ran. The cat sat. It was fun."
    hard = (
        "Extraordinarily convoluted administrative considerations "
        "necessitate comprehensive organizational restructuring "
        "initiatives immediately."
    )
    df = spark.createDataFrame(
        [(1, easy), (2, hard)], "id long, text string"
    )
    out = {r.id: r.flesch for r in flesch_reading_scores(df, "id", "text").collect()}
    assert out[1] > out[2]
