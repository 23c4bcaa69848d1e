"""Streaming incremental gram: batch/stream BIT-exact parity of the
merged gram and the derived top component; replay idempotence."""

import json
import os

import numpy as np

from hmpps_digital_prison_reporting_glue_poc_spark.operators.similarity import (
    pca_top_component,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.gram_stream import (
    read_stream_gram,
    read_stream_top_component,
    stream_gram_accumulate,
)

from pyspark.sql import types as T

SRC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

DIM = 6


def _write(srcdir, name, mat, start_id=0):
    with open(os.path.join(srcdir, name), "w") as f:
        for i, row in enumerate(mat):
            f.write(
                json.dumps(
                    {
                        "vec_id": start_id + i,
                        "embedding": [float(x) for x in row],
                    }
                )
                + "\n"
            )


def _run(spark, srcdir, gram_path, ckpt):
    q = stream_gram_accumulate(
        spark, srcdir, SRC_SCHEMA, gram_path, ckpt, dim=DIM
    )
    q.awaitTermination(180)


def test_stream_gram_matches_batch_exactly(spark, tmp_path):
    srcdir = os.path.join(str(tmp_path), "src")
    gram_path = os.path.join(str(tmp_path), "gram")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    rng = np.random.default_rng(21)
    m1 = rng.normal(size=(40, DIM))
    m2 = rng.normal(size=(25, DIM))
    _write(srcdir, "b1.json", m1)
    _run(spark, srcdir, gram_path, ckpt)
    _write(srcdir, "b2.json", m2, start_id=100)
    _run(spark, srcdir, gram_path, ckpt)

    # batch twin over the concatenated stream
    full = np.vstack([m1, m2])
    rows = [(i, [float(x) for x in r]) for i, r in enumerate(full)]
    batch_df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    batch_out = {
        r.dim_idx: (r.component, r.eigenvalue_q2)
        for r in pca_top_component(batch_df, n_iter=6).collect()
    }
    stream_out = {
        r.dim_idx: (r.component, r.eigenvalue_q2)
        for r in read_stream_top_component(
            spark, gram_path, dim=DIM, n_iter=6
        ).collect()
    }
    assert stream_out == batch_out  # BIT-exact, not approximate

    # the merged gram itself is integer-exact vs numpy (after the same
    # float32 storage round-trip both Spark paths apply)
    q = np.floor(
        full.astype(np.float32).astype(np.float64) * 1e6
    ).astype(np.int64)
    want = q.T @ q
    got = {
        (r.i, r.j): int(r.g)
        for r in read_stream_gram(spark, gram_path).collect()
    }
    for i in range(DIM):
        for j in range(i, DIM):
            assert got[(i, j)] == want[i, j]


def test_stream_gram_replay_idempotent(spark, tmp_path):
    """Re-running the stream with the SAME checkpoint must not
    double-add (delta partitions replace, never stack)."""
    srcdir = os.path.join(str(tmp_path), "src")
    gram_path = os.path.join(str(tmp_path), "gram")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    rng = np.random.default_rng(3)
    m = rng.normal(size=(30, DIM))
    _write(srcdir, "b1.json", m)
    _run(spark, srcdir, gram_path, ckpt)
    before = {
        (r.i, r.j): int(r.g)
        for r in read_stream_gram(spark, gram_path).collect()
    }
    # same checkpoint, no new files: a no-op run must leave state intact
    _run(spark, srcdir, gram_path, ckpt)
    after = {
        (r.i, r.j): int(r.g)
        for r in read_stream_gram(spark, gram_path).collect()
    }
    assert after == before
