"""Wave 97: label-propagation communities + Cramér's V — hand-computed
goldens through the queries() registry on synthetic slices."""

from __future__ import annotations

import math
import os

import pytest

import __spark_entry__ as entry_mod


def test_lpa_two_triangles(spark, tmp_path):
    # bigram edges form two disjoint triangles {a,b,c} and {x,y,z};
    # 4 synchronous mode/lex rounds converge each to its lex-min label
    docs = [
        (1, "a b a c", "en", "s1", 7),
        (2, "b c", "en", "s1", 3),
        (3, "x y", "en", "s1", 3),
        (4, "y z x z", "en", "s1", 7),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {
        r.community: r.n_members
        for r in entry_mod.queries()["lpa_token_communities"](
            spark, sf
        ).collect()
    }
    assert out == {"a": 3, "x": 3}


def test_lpa_star_absorbs(spark, tmp_path):
    # star: hub h with leaves l1..l3 — the classic synchronous-LPA
    # oscillator. r1: leaves adopt 'h' (their only neighbor's label),
    # h adopts the lex-min leaf label 'l1'. r2: leaves see h='l1' ->
    # 'l1'; h sees leaves='h' x3 -> 'h'. r3: leaves 'h'; h 'l1'.
    # r4: leaves 'l1'; h 'h'. The fixed horizon makes the round-4
    # state THE defined output: h -> 'h', leaves -> 'l1'.
    docs = [(1, "h l1 h l2 h l3", "en", "s1", 14)]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {
        r.community: r.n_members
        for r in entry_mod.queries()["lpa_token_communities"](
            spark, sf
        ).collect()
    }
    # communities after round 4: {h: 1 member (h itself), l1: 3 leaves}
    assert out == {"h": 1, "l1": 3}


def test_cramers_v_golden(spark, tmp_path):
    # 2x2 with counts A1=3, A2=1, B1=1, B2=3: chi2 = 2, V = 0.5
    rows = (
        [(i, "c", 1, 0.0, "A") for i in range(3)]
        + [(3, "c", 2, 0.0, "A")]
        + [(4, "c", 1, 0.0, "B")]
        + [(5 + i, "c", 2, 0.0, "B") for i in range(3)]
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.parquet(os.path.join(sf, "customer.parquet"))
    row = entry_mod.queries()["cramers_v_segment_nation"](
        spark, sf
    ).collect()[0]
    assert (row.n, row.n_rows, row.n_cols) == (8, 2, 2)
    assert row.chi2 == pytest.approx(2.0, abs=1e-5)
    assert row.cramers_v == pytest.approx(0.5, abs=1e-5)


def test_cramers_v_degenerate_single_column(spark, tmp_path):
    # one nation only: min(R-1, C-1) = 0 -> V NULL, chi2 exactly 0
    rows = [(1, "c", 1, 0.0, "A"), (2, "c", 1, 0.0, "B")]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.parquet(os.path.join(sf, "customer.parquet"))
    row = entry_mod.queries()["cramers_v_segment_nation"](
        spark, sf
    ).collect()[0]
    assert (row.n, row.n_rows, row.n_cols) == (2, 2, 1)
    assert row.chi2 == pytest.approx(0.0, abs=1e-9)
    assert row.cramers_v is None


def test_lpa_canonicalizes_dirty_edges(spark):
    """r9 ADVICE regression: label_propagation is a public API and must
    canonicalize its own input — duplicate rows, both orientations, and
    self-loops must not double-count neighbor labels."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.graph import label_propagation

    clean = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")],
        "a string, b string",
    )
    dirty = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"), ("a", "b"),  # dup + reverse
            ("b", "c"), ("a", "c"), ("c", "a"),
            ("x", "y"), ("y", "x"), ("y", "y"),  # self-loop
        ],
        "a string, b string",
    )
    want = {
        r.community: r.n_members
        for r in label_propagation(clean, rounds=4).collect()
    }
    got = {
        r.community: r.n_members
        for r in label_propagation(dirty, rounds=4).collect()
    }
    # the x-y pair is the classic synchronous-LPA oscillator: after an
    # even round count each vertex holds its own label again
    assert got == want == {"a": 3, "x": 1, "y": 1}
