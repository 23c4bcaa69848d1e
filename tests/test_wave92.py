"""Wave 92: Heaps'-law vocabulary growth and dow×hour heatmap —
hand-computed goldens."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    activity_heatmap_dow_hour,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import (
    heaps_law_vocab_growth,
)

DOCS = [
    (1, "a b c"),        # 3 new types
    (2, "a b d"),        # 1 new (d)
    (3, "a e e"),        # 1 new (e)
    (4, "f"),            # 1 new (f)
]


def test_heaps_golden_two_buckets(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r.bucket: r for r in heaps_law_vocab_growth(df, n_buckets=2).collect()}
    # ranks 1..4 -> bucket = (2*(r-1)) div 4: docs 1,2 -> 0; 3,4 -> 1
    b0, b1 = out[0], out[1]
    assert (b0.n_docs, b1.n_docs) == (2, 2)
    assert b0.cum_tokens == 6 and b1.cum_tokens == 10
    assert b0.new_types == 4  # a b c d
    assert b1.new_types == 2  # e f
    assert b1.cum_types == 6


def test_heaps_monotone_and_total(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = sorted(
        heaps_law_vocab_growth(df, n_buckets=4).collect(),
        key=lambda r: r.bucket,
    )
    cum = [r.cum_types for r in rows]
    assert cum == sorted(cum)
    assert cum[-1] == 6  # total distinct types
    assert rows[-1].cum_tokens == 10


def test_heaps_partition_independent(spark):
    a = heaps_law_vocab_growth(
        spark.createDataFrame(DOCS, "doc_id long, text string"), n_buckets=2
    ).collect()
    b = heaps_law_vocab_growth(
        spark.createDataFrame(DOCS, "doc_id long, text string").repartition(5),
        n_buckets=2,
    ).collect()
    assert sorted(map(repr, a)) == sorted(map(repr, b))


def test_heatmap_golden(spark):
    # 1970-01-05 was a Monday -> dow 0 under (epoch+3)%7
    t0 = datetime.datetime(1970, 1, 5, 9)
    rows = [
        (1, t0, 1, "view", 1.0),                                  # Mon 09
        (2, t0 + datetime.timedelta(hours=1), 1, "view", 1.0),    # Mon 10
        (3, t0 + datetime.timedelta(hours=1), 2, "click", 1.0),   # Mon 10
        (4, t0 + datetime.timedelta(days=5), 2, "view", 1.0),     # Sat 09
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {(r.dow, r.hour): r for r in activity_heatmap_dow_hour(df).collect()}
    assert out[(0, 9)].n_events == 1
    assert out[(0, 10)].n_events == 2
    assert out[(5, 9)].n_events == 1
    assert out[(0, 10)].is_peak and not out[(0, 9)].is_peak
    assert out[(0, 10)].share == pytest.approx(0.5)
    assert sum(r.n_events for r in out.values()) == 4
