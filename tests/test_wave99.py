"""Wave 99: G-test of independence + token-graph link prediction —
hand-computed goldens through the queries() registry."""

from __future__ import annotations

import math
import os

import pytest

import __spark_entry__ as entry_mod


def test_g_test_golden(spark, tmp_path):
    # 2x2 (lang x source): en/s1=3, en/s2=1, fr/s1=1, fr/s2=3 -> e=2
    # G = 2*(3ln1.5 + ln0.5 + ln0.5 + 3ln1.5) = 12ln1.5 + 4ln0.5
    docs = (
        [(i, "t", "en", "s1", 1) for i in range(3)]
        + [(3, "t", "en", "s2", 1)]
        + [(4, "t", "fr", "s1", 1)]
        + [(5 + i, "t", "fr", "s2", 1) for i in range(3)]
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    r = entry_mod.queries()["g_test_lang_source"](spark, sf).collect()[0]
    assert (r.n, r.n_rows, r.n_cols, r.df) == (8, 2, 2, 1)
    expected = 12 * math.log(1.5) + 4 * math.log(0.5)
    assert r.g_stat == pytest.approx(expected, abs=1e-5)


def test_g_test_degenerate_single_row_category(spark, tmp_path):
    docs = [(1, "t", "en", "s1", 1), (2, "t", "en", "s2", 1)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    r = entry_mod.queries()["g_test_lang_source"](spark, sf).collect()[0]
    assert (r.n, r.n_rows, r.n_cols, r.df) == (2, 1, 2, 0)
    assert r.g_stat is None


def test_link_prediction_square(spark, tmp_path):
    # 4-cycle a-b-c-d-a: (a,c) share {b,d}, (b,d) share {a,c};
    # all degrees 2 -> jaccard = 2/(2+2-2) = 1.0,
    # adamic_adar = 2 * 1/ln(2); pair (a,b) shares only x (one common
    # neighbor via the extra wedge) -> dropped by min_common=2
    docs = [
        (1, "a b", "en", "s1", 3),
        (2, "b c", "en", "s1", 3),
        (3, "c d", "en", "s1", 3),
        (4, "a d", "en", "s1", 3),
        (5, "x a", "en", "s1", 3),
        (6, "x b", "en", "s1", 3),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {
        (r.vertex_a, r.vertex_b): r
        for r in entry_mod.queries()["link_prediction_tokens"](
            spark, sf
        ).collect()
    }
    # with the x-wedge, a and b have degree 3; (a,c) common {b,d},
    # (b,d) common {a,c}, (a,b) common {x} -> filtered
    assert set(out) == {("a", "c"), ("b", "d")}
    ac = out[("a", "c")]
    assert (ac.common, ac.deg_a, ac.deg_b) == (2, 3, 2)
    assert ac.jaccard == pytest.approx(2 / 3, abs=1e-9)
    # b (deg 3) and d (deg 2) as shared neighbors of (a,c)
    aa = round(1e6 / math.log(3)) / 1e6 + round(1e6 / math.log(2)) / 1e6
    assert ac.adamic_adar == pytest.approx(aa, abs=1e-6)


def test_link_prediction_empty(spark, tmp_path):
    docs = [(1, "solo", "en", "s1", 4)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    assert (
        entry_mod.queries()["link_prediction_tokens"](spark, sf).count()
        == 0
    )
