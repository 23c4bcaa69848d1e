"""Wave 101: Nelson-Aalen cumulative hazard + Chao1/Good-Turing
vocabulary richness — hand-computed goldens through the registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def test_nelson_aalen_golden(spark, tmp_path):
    ts = datetime.datetime
    # same survival fixture as wave 96: event times t=0 (n=5, d=1),
    # t=2 (n=4, d=2), t=27 (n=1, d=1); u104 censored at t=19
    rows = [
        (1, ts(2025, 1, 1, 10), 101, "purchase", 2.0, "{}"),
        (2, ts(2025, 1, 1, 9), 102, "click", 1.0, "{}"),
        (3, ts(2025, 1, 3, 9), 102, "purchase", 3.0, "{}"),
        (4, ts(2025, 1, 1, 8), 103, "click", 1.0, "{}"),
        (5, ts(2025, 1, 3, 8), 103, "purchase", 4.0, "{}"),
        (6, ts(2025, 1, 1, 7), 104, "click", 1.0, "{}"),
        (7, ts(2025, 1, 20, 7), 104, "view", 1.0, "{}"),
        (8, ts(2025, 1, 5, 6), 105, "click", 1.0, "{}"),
        (9, ts(2025, 2, 1, 6), 105, "purchase", 5.0, "{}"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    out = {
        r.t_day: r
        for r in entry_mod.queries()["nelson_aalen_conversion"](
            spark, sf
        ).collect()
    }
    assert sorted(out) == [0, 2, 27]
    # H(0) = 1/5, H(2) = 1/5 + 2/4, H(27) = ... + 1/1
    assert out[0].cum_hazard_micros == 200000
    assert out[2].cum_hazard_micros == 700000
    assert out[27].cum_hazard_micros == 1700000
    assert out[27].cum_hazard == pytest.approx(1.7)
    assert (out[2].n_risk, out[2].d_event) == (4, 2)


def test_vocab_richness_golden(spark, tmp_path):
    docs = [
        (1, "a a b c", "en", "s1", 7),
        (2, "c d", "en", "s1", 3),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    r = entry_mod.queries()["vocab_richness_docs"](spark, sf).collect()[0]
    # a:2 b:1 c:2 d:1 -> N=6 V=4 N1=2 N2=2
    assert (r.n_tokens, r.vocab, r.n_singletons, r.n_doubletons) == (
        6,
        4,
        2,
        2,
    )
    assert r.chao1 == pytest.approx(4 + 2 * 1 / (2 * 3), abs=1e-9)
    assert r.unseen_mass == pytest.approx(2 / 6, abs=1e-9)


def test_vocab_richness_empty_corpus(spark, tmp_path):
    docs = [(1, "", "en", "s1", 0)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    r = entry_mod.queries()["vocab_richness_docs"](spark, sf).collect()[0]
    assert (r.n_tokens, r.vocab, r.n_singletons, r.n_doubletons) == (
        0,
        0,
        0,
        0,
    )
    assert r.chao1 is None and r.unseen_mass is None
