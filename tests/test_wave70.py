"""Wave 70: deterministic JL projection (distance preservation,
engine-free matrix) and Brier decomposition (identity + closed forms)."""

from __future__ import annotations

import numpy as np
import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    brier_decomposition_bins,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.similarity import (
    jl_project,
    jl_sign,
)


def _frame(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_jl_sign_deterministic_and_balanced():
    signs = [jl_sign("v1", i, j) for i in range(16) for j in range(64)]
    assert set(signs) == {-1, 1}
    # md5 nibbles are uniform: the matrix should be roughly balanced
    frac_pos = signs.count(1) / len(signs)
    assert 0.4 < frac_pos < 0.6
    assert jl_sign("v1", 3, 7) == jl_sign("v1", 3, 7)
    assert any(
        jl_sign("v1", i, j) != jl_sign("other", i, j)
        for i in range(4)
        for j in range(4)
    )


def test_jl_matches_reference_matmul(spark):
    rng = np.random.default_rng(9)
    mat = rng.normal(size=(40, 64)).astype(np.float32)
    out = jl_project(_frame(spark, mat), k=16).collect()
    signs = np.array(
        [[jl_sign("v1", i, j) for j in range(64)] for i in range(16)],
        dtype=np.int64,
    )
    q = np.floor(mat.astype(np.float64) * 1e6).astype(np.int64)
    want = q @ signs.T
    got = {(r.vec_id, r.out_dim): r.y_micro for r in out}
    for vid in range(40):
        for k_ in range(16):
            assert got[(vid, k_)] == want[vid, k_]
    # normalization: component = y_micro / 4e6 exactly
    sample = out[0]
    assert sample.component == pytest.approx(sample.y_micro / 4e6)


def test_jl_preserves_cluster_separation(spark):
    """JL smoke on STRUCTURED data (isotropic Gaussian distances all
    concentrate, so correlation is uninformative there): two
    well-separated clusters stay separated — every between-cluster
    projected distance exceeds every within-cluster one."""
    rng = np.random.default_rng(4)
    a = rng.normal(size=(15, 64)) * 0.2
    b = rng.normal(size=(15, 64)) * 0.2 + 3.0
    mat = np.vstack([a, b])
    out = jl_project(_frame(spark, mat), k=16).collect()
    proj = np.zeros((30, 16))
    for r in out:
        proj[r.vec_id, r.out_dim] = r.component
    within, between = [], []
    for x in range(30):
        for y in range(x + 1, 30):
            dist = np.linalg.norm(proj[x] - proj[y])
            (within if (x < 15) == (y < 15) else between).append(dist)
    assert min(between) > max(within)


def test_jl_rejects_non_square_k(spark):
    mat = np.zeros((2, 8))
    with pytest.raises(ValueError):
        jl_project(_frame(spark, mat), k=10)


def test_brier_identity_holds(spark):
    """reliability − resolution + uncertainty == mean Brier score of the
    bin-mean forecasts (computed brute-force on the same bins)."""
    rows = [(i, 100, i * 7 % 97 < 40) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "num long, den long, y boolean")
    out = brier_decomposition_bins(df, "num", "den", "y", n_bins=5).collect()
    rel = sum(r.reliability_term for r in out)
    res = sum(r.resolution_term for r in out)
    unc = out[0].uncertainty
    # brute force with bin-mean forecasts
    total_n = sum(r.n for r in out)
    brier = sum(
        r.n
        * (
            (r.mean_score - 1) ** 2 * (r.n_pos / r.n)
            + (r.mean_score - 0) ** 2 * (1 - r.n_pos / r.n)
        )
        for r in out
    ) / total_n
    assert rel - res + unc == pytest.approx(brier, abs=1e-12)


def test_brier_perfectly_calibrated_bins_zero_reliability(spark):
    """Forecast 0.25 with exactly 1-in-4 positives: reliability 0."""
    rows = []
    for i in range(40):
        rows.append((25, 100, i % 4 == 0))
    df = spark.createDataFrame(rows, "num long, den long, y boolean")
    out = brier_decomposition_bins(df, "num", "den", "y", n_bins=4).collect()
    assert len(out) == 1
    assert out[0].reliability_term == pytest.approx(0.0)
    assert out[0].resolution_term == pytest.approx(0.0)  # one bin = no spread
    assert out[0].uncertainty == pytest.approx(0.25 * 0.75)
