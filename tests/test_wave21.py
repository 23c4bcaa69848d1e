"""Wave-21 operators: BPE merge candidates, embedding dimension stats,
Matryoshka prefix norms, quality decile audit."""

from __future__ import annotations

import numpy as np

from hmpps_digital_prison_reporting_glue_poc_spark.operators import mixing as mx
from hmpps_digital_prison_reporting_glue_poc_spark.operators import similarity as sim
from hmpps_digital_prison_reporting_glue_poc_spark.operators import textstats as ts


def test_bpe_merge_candidates_counts(spark):
    # "abab" x3 + "ab" x2: pair "ab" weight 3*2+2*1? No — pairs per word
    # occurrence ARE word-frequency weighted: "abab" has pairs ab,ba,ab.
    df = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "abab ab cd")],
        "doc_id long, text string",
    )
    got = {r.pair: r.n_weighted for r in ts.bpe_merge_candidates(
        df, top_k=10
    ).collect()}
    # word freqs: abab=3, ab=2, cd=1
    # "abab": pairs ab, ba, ab -> ab x2, ba x1 per occurrence
    assert got["ab"] == 3 * 2 + 2 * 1
    assert got["ba"] == 3
    assert got["cd"] == 1


def test_bpe_top_pair_is_the_merge(spark):
    df = spark.createDataFrame(
        [(i, "low lower lowest") for i in range(5)],
        "doc_id long, text string",
    )
    top = ts.bpe_merge_candidates(df, top_k=1).collect()[0]
    # "lo" and "ow" both appear once in each of the 3 words; ties break
    # lexicographically -> "lo"
    assert top.pair == "lo"


def test_embedding_dim_stats_exact(spark):
    mat = np.array([[0.5, -0.5], [0.25, 0.75], [0.0, -0.25]])
    df = spark.createDataFrame(
        [(i, [float(a) for a in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    got = {r.dim: r for r in sim.embedding_dim_stats(df).collect()}
    q = np.floor(mat * 1e6).astype(np.int64)
    for j in range(2):
        col = q[:, j]
        n = len(col)
        mean = col.sum() / n / 1e6
        var = (n * (col * col).sum() - col.sum() ** 2) / (n * n) / 1e12
        assert abs(got[j].mean - mean) < 1e-12
        assert abs(got[j].variance - var) < 1e-9
        assert got[j].dim_min == col.min() / 1e6
        assert got[j].dim_max == col.max() / 1e6


def test_matryoshka_prefix_shares(spark):
    # vector with all mass in the first 16 dims -> share_16 == 1.0
    front = [1.0] * 16 + [0.0] * 48
    spread = [0.5] * 64
    df = spark.createDataFrame(
        [(1, front), (2, spread)], "vec_id long, embedding array<double>"
    )
    got = {r.vec_id: r for r in sim.matryoshka_prefix_norms(df).collect()}
    assert got[1].share_16 == 1.0 and got[1].share_32 == 1.0
    assert abs(got[2].share_16 - (16 / 64) ** 0.5) < 1e-12
    assert abs(got[2].share_32 - (32 / 64) ** 0.5) < 1e-12
    assert got[2].share_16 < got[2].share_32 < 1.0


def test_quality_decile_audit_buckets(spark):
    rows = [(i, "s", i, i * 100) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, score long, sig long"
    )
    out = sorted(
        mx.quality_decile_audit(df, "score", "sig", "source", "doc_id").collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in out] == list(range(1, 11))
    assert all(r.n_docs == 2 for r in out)
    # decile 1 holds scores 0,1 -> mean signal (0+100)/2
    assert out[0].mean_signal == 50.0
    assert out[0].min_score == 0 and out[0].max_score == 1
    # monotone calibration: mean signal rises with decile here
    assert all(
        out[i].mean_signal < out[i + 1].mean_signal for i in range(9)
    )
