"""Wave 67: exact-gram PCA top component — numpy eigensolver
differential, known-direction recovery, partition independence of the
integer gram."""

from __future__ import annotations

import numpy as np
import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.similarity import (
    pca_top_component,
)


def _frame(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _numpy_top(mat):
    q = np.floor(mat.astype(np.float64) * 1e6).astype(np.int64)
    g = (q.T @ q).astype(np.float64)
    vals, vecs = np.linalg.eigh(g)
    v = vecs[:, -1]
    return v / v[np.argmax(np.abs(v))]


def test_recovers_planted_direction(spark):
    """Vectors concentrated along a planted direction: the top component
    must align with it (cosine > 0.99 after both are normalized)."""
    rng = np.random.default_rng(5)
    d = 8
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    mat = np.outer(rng.normal(size=200) * 3, direction) + 0.05 * rng.normal(
        size=(200, d)
    )
    out = (
        pca_top_component(_frame(spark, mat), n_iter=12)
        .orderBy("dim_idx")
        .collect()
    )
    got = np.array([r.component for r in out])
    got = got / np.linalg.norm(got)
    cos = abs(float(got @ direction))
    assert cos > 0.99


def test_matches_numpy_eigensolver(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(120, 6))
    mat[:, 2] *= 5  # dominant axis with a clear spectral gap
    out = (
        pca_top_component(_frame(spark, mat), n_iter=20)
        .orderBy("dim_idx")
        .collect()
    )
    got = np.array([r.component for r in out])
    want = _numpy_top(mat)
    # sign-align on the max-|.| entry, then compare
    if np.sign(got[np.argmax(np.abs(got))]) != np.sign(
        want[np.argmax(np.abs(want))]
    ):
        want = -want
    assert np.max(np.abs(got - want)) < 1e-3
    assert np.max(np.abs(got)) == pytest.approx(1.0)


def test_eigenvalue_positive_and_scaled(spark):
    rng = np.random.default_rng(2)
    mat = rng.normal(size=(50, 4))
    out = pca_top_component(_frame(spark, mat), n_iter=8).collect()
    lam = out[0].eigenvalue_q2
    assert all(r.eigenvalue_q2 == lam for r in out)
    assert lam > 0
    assert isinstance(lam, int)


def test_gram_partition_independence(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(80, 5))
    df1 = _frame(spark, mat)
    a = {
        r.dim_idx: (r.component, r.eigenvalue_q2)
        for r in pca_top_component(df1, n_iter=6).collect()
    }
    b = {
        r.dim_idx: (r.component, r.eigenvalue_q2)
        for r in pca_top_component(df1.repartition(16), n_iter=6).collect()
    }
    assert a == b
