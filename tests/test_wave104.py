"""Wave 104: token burstiness + source vocabulary overlap — hand
computed goldens through the queries() registry."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod


def _docs(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_burstiness_golden(spark, tmp_path):
    # D=3 docs; a: T=3 Q=9 (one doc), b: T=2 Q=2 (two docs), c: T=2 Q=4
    # fano = (D*Q - T^2)/(D*T): a=18/9=2, b=2/6, c=8/6
    sf = _docs(
        spark,
        tmp_path,
        [
            (1, "a a a b", "en", "s1", 7),
            (2, "b", "en", "s1", 1),
            (3, "c c", "en", "s1", 3),
        ],
    )
    out = {
        r.token: r
        for r in entry_mod.queries()["token_burstiness_top"](
            spark, sf
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    assert (out["a"].total_count, out["a"].n_docs_with) == (3, 1)
    assert out["a"].fano == pytest.approx(2.0)
    # b spread over 2 docs -> sub-Poisson; c concentrated -> bursty
    assert out["b"].fano == pytest.approx(2 / 6, abs=1e-9)
    assert out["c"].fano == pytest.approx(8 / 6, abs=1e-9)
    assert out["c"].fano > out["b"].fano


def test_vocab_overlap_golden(spark, tmp_path):
    sf = _docs(
        spark,
        tmp_path,
        [
            (1, "a b c", "en", "s1", 5),
            (2, "b c d", "en", "s2", 5),
            (3, "x y", "en", "s3", 3),
        ],
    )
    out = {
        (r.source_a, r.source_b): r
        for r in entry_mod.queries()["source_vocab_overlap_pairs"](
            spark, sf
        ).collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    p12 = out[("s1", "s2")]
    assert (p12.overlap, p12.union_size) == (2, 4)
    assert p12.jaccard == pytest.approx(0.5)
    p13 = out[("s1", "s3")]
    assert (p13.overlap, p13.union_size) == (0, 5)
    assert p13.jaccard == pytest.approx(0.0)
