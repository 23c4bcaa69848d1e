"""Wave-29 operators: containment pairs, source language entropy,
embedding outlier rate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.corpus import source_language_entropy
from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import containment_pairs
from hmpps_digital_prison_reporting_glue_poc_spark.operators.similarity import (
    embedding_outlier_rate,
)


def test_containment_catches_doc_inside_doc(spark):
    # doc 1 fully contained in doc 2; jaccard = 3/10 (< any dedup bar)
    long_text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, "w0 w1 w2"), (2, long_text), (3, "x y z")],
        "doc_id long, text string",
    )
    rows = containment_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    got = {(r.id_a, r.id_b): r for r in rows}
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert r.inter == 3 and r.size_a == 3 and r.size_b == 10
    assert r.containment_a_in_b == pytest.approx(1.0)
    assert r.containment_b_in_a == pytest.approx(0.3)


def test_containment_threshold_excludes_partial_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y")], "doc_id long, text string"
    )
    # containment 0.5 both ways -> below 0.9
    assert containment_pairs(docs, "doc_id", "text", threshold=0.9).count() == 0
    assert containment_pairs(docs, "doc_id", "text", threshold=0.5).count() == 1


def test_source_language_entropy_values(spark):
    docs = spark.createDataFrame(
        [("s1", "en")] * 2 + [("s1", "fr")] * 2 + [("s2", "en")] * 3,
        "source string, lang string",
    )
    got = {r.source: r for r in
           source_language_entropy(docs, "source", "lang").collect()}
    assert got["s1"].n_docs == 4 and got["s1"].n_langs == 2
    assert got["s1"].lang_entropy == pytest.approx(math.log(2), abs=1e-6)
    assert got["s2"].n_docs == 3 and got["s2"].n_langs == 1
    assert got["s2"].lang_entropy == 0.0


def test_embedding_outlier_rate_flags_planted_outlier(spark):
    # dim 0: 19 values at 0.0 and one at 100.0 -> the spike is far beyond
    # 3 sigma of the dim distribution; dim 1: constant -> zero variance,
    # zero outliers
    rows = [(i, [0.0, 5.0]) for i in range(19)] + [(19, [100.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.dim: r for r in embedding_outlier_rate(df, "embedding").collect()}
    assert got[0].n == 20 and got[0].n_outliers == 1
    assert got[0].outlier_rate == pytest.approx(0.05)
    assert got[1].n_outliers == 0 and got[1].outlier_rate == 0.0
