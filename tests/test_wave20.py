"""Wave-20 operators: k-means Lloyd refinement, int8 quantization audit,
per-domain quantile gating, weighted top-k sampling, chunk-embed-pool,
LSH recall evaluation."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators import corpus as cp
from hmpps_digital_prison_reporting_glue_poc_spark.operators import mixing as mx
from hmpps_digital_prison_reporting_glue_poc_spark.operators import sampling as sp
from hmpps_digital_prison_reporting_glue_poc_spark.operators import similarity as sim


def _vecs(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


def test_kmeans_refine_matches_numpy_model(spark):
    rng = np.random.RandomState(11)
    mat = rng.normal(scale=0.5, size=(40, 64))
    got = {
        r.vec_id: (r.cluster0, r.cluster1, r.moved)
        for r in sim.kmeans_refine(
            spark, _vecs(spark, mat), n_clusters=4
        ).collect()
    }
    cc = sim.md5_coarse_centroids(4, 64, 1000)
    qm = np.floor(mat * 1000).astype(np.int64)
    d0 = ((qm[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
    c0 = d0.argmin(axis=1)
    refined = (cc * 1000).copy()
    for l in range(4):
        members = qm[c0 == l]
        if len(members):
            s = members.sum(axis=0) * 1000
            c = len(members)
            for j in range(64):
                sj = int(s[j])
                if sj >= 0:
                    refined[l, j] = (2 * sj + c) // (2 * c)
                else:
                    refined[l, j] = -((2 * (-sj) + c) // (2 * c))
    d1 = ((qm[:, None, :] * 1000 - refined[None, :, :]) ** 2).sum(axis=2)
    c1 = d1.argmin(axis=1)
    for i in range(40):
        assert got[i] == (c0[i], c1[i], bool(c0[i] != c1[i])), i


def test_kmeans_refine_handles_empty_clusters(spark):
    """Clusters that attract no vectors keep their md5 seed centroid
    (x1000 grid) — the refinement must not crash or collapse them."""
    # 3 nearly identical vectors -> all land in ONE seed cluster of 8
    base = np.linspace(-0.5, 0.5, 64)
    mat = np.vstack([base, base + 1e-9, base - 1e-9])
    out = sim.kmeans_refine(spark, _vecs(spark, mat), n_clusters=8).collect()
    assert len(out) == 3
    assert len({r.cluster0 for r in out}) == 1
    # with 7 empty clusters retaining their seeds and the occupied one
    # moving to the members' mean, the members stay together
    assert len({r.cluster1 for r in out}) == 1
    assert all(not r.moved or r.cluster0 != r.cluster1 for r in out)


def test_int8_quant_audit_properties(spark):
    mat = np.array(
        [
            [0.5, -0.25, 0.125, 0.0],
            [1.0, 1.0, -1.0, 0.5],
            [0.003, 0.001, -0.002, 0.0015],
        ]
    )
    rows = {r.vec_id: r for r in sim.int8_quant_stats(
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
            "vec_id long, embedding array<double>",
        )
    ).collect()}
    for i, row in enumerate(mat):
        r = rows[i]
        q = np.floor(row * 1e6).astype(np.int64)
        amax = np.abs(q).max()
        assert r.amax == amax / 1e6
        # the max-magnitude element always saturates to +/-127
        assert r.n_saturated >= 1
        # SSE bound: each residual < amax/(2*127) + quantization slack
        assert 0 <= r.sse < len(row) * (r.amax / 254 + 1e-6) ** 2 * 1.01


def test_quality_gate_drops_exact_bottom_fraction(spark):
    rows = [(i, "a", i * 10) for i in range(10)] + [
        (i + 100, "b", -i) for i in range(7)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    kept = mx.quality_quantile_gate(
        df, "score", "source", "doc_id", drop_frac=0.2
    ).collect()
    by = {}
    for r in kept:
        by.setdefault(r.source, set()).add(r.doc_id)
    # group a: 10 rows, cutoff floor(2.0)=2 -> drops scores 0,10 (ids 0,1)
    assert by["a"] == set(range(2, 10))
    # group b: 7 rows, cutoff floor(1.4)=1 -> drops the lowest score
    # (score -6, id 106)
    assert by["b"] == {100, 101, 102, 103, 104, 105}


def test_weighted_topk_sample_matches_brute_force(spark):
    rows = [(i, (i % 5) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        r.doc_id
        for r in sp.weighted_topk_sample(df, "w", "doc_id", k=20)
        .orderBy(F.col("samp_key").desc(), F.col("doc_id").asc())
        .collect()
    ]

    def key(i, w):
        u32 = int(hashlib.md5(f"wrs:{i}".encode()).hexdigest()[:8], 16)
        u = (u32 + 1) / 2**32
        return round(math.log(u), 6) / w

    expect = sorted(rows, key=lambda t: (-key(*t), t[0]))[:20]
    assert got == [i for i, _ in expect]


def test_weighted_topk_prefers_heavy_rows(spark):
    # weight 1000 vs weight 1: heavy rows should dominate the sample
    rows = [(i, 1000 if i < 50 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        r.doc_id for r in sp.weighted_topk_sample(df, "w", "doc_id", k=30).collect()
    ]
    heavy = sum(1 for i in got if i < 50)
    assert heavy >= 20  # 10% of rows, >2/3 of the sample


def test_chunk_embed_pool_shape_and_range(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(150))),  # 3 chunks at 64/48
        (2, "one two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in cp.chunk_embed_pool(
        df, size=64, stride=48, dim=4
    ).collect()}
    assert out[1].n_chunks == 4  # starts 0,48,96,144
    assert out[2].n_chunks == 1
    for r in out.values():
        for j in range(4):
            assert 0.0 <= r[f"p{j}"] < 1.0
    # single-chunk doc: pooled vector == that chunk's embedding
    chunk_md5 = hashlib.md5(b"one two").hexdigest()
    for j in range(4):
        e = round(
            int(
                hashlib.md5(f"{j}:{chunk_md5}".encode()).hexdigest()[:8], 16
            )
            / 2**32,
            9,
        )
        assert abs(out[2][f"p{j}"] - e) < 1e-12
