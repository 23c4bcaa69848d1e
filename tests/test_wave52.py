"""Wave 52: residual IVF-PQ — the IVFADC claim (residual encoding beats
raw-vector encoding at the same codebook budget) plus determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.similarity import (
    ivfpq_residual_topk,
    ivfpq_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_residual_reduces_self_quantization_error(spark):
    """A query that IS a corpus vector always probes its own assigned
    list first, so its self-match row is always a candidate; that row's
    ADC distance is (approximately) the vector's quantization error.
    Residual encoding must cut the summed self-error vs raw-vector
    encoding at the same codebook budget — the reason IVFADC encodes
    residuals."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 32)
    kw = dict(k=10_000, n_lists=8, nprobe=2, n_subspaces=8, n_centroids=16)
    raw = (
        ivfpq_topk(spark, emb, queries, **kw)
        .filter(F.col("query_id") == F.col("neighbor_id"))
        .agg(F.sum("adc_dist").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )
    res = (
        ivfpq_residual_topk(spark, emb, queries, **kw)
        .filter(F.col("query_id") == F.col("neighbor_id"))
        .agg(F.sum("adc_dist").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert raw.n == 32 and res.n == 32  # self always a candidate
    assert res.s < raw.s, f"residual {res.s} should beat raw {raw.s}"
    # and by a real margin, not noise
    assert res.s < 0.8 * raw.s


def test_residual_topk_shape_and_determinism(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    out1 = sorted(
        map(tuple, ivfpq_residual_topk(spark, emb, queries, k=5).collect())
    )
    out2 = sorted(
        map(
            tuple,
            ivfpq_residual_topk(
                spark, emb.repartition(7), queries, k=5
            ).collect(),
        )
    )
    assert out1 == out2  # partition-independent (integer pipeline)
    per_q = {}
    for qid, _nid, _d, rank in out1:
        per_q.setdefault(qid, []).append(rank)
    assert set(per_q) == {0, 1, 2, 3, 4}
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]
