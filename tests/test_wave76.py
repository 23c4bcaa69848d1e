"""Wave 76: centroid cosine drift (scale-invariant integer sums) and
Lorenz curve deciles — identical/orthogonal groups, curve invariants."""

from __future__ import annotations

import numpy as np
import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    lorenz_deciles,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.similarity import (
    centroid_cosine_drift,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "half long, embedding array<float>"
    )


def test_centroid_identical_groups_cosine_one(spark):
    vecs = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    rows = [(0, v) for v in vecs] + [(1, v) for v in vecs]
    row = centroid_cosine_drift(_emb(spark, rows), "half").collect()[0]
    assert row.centroid_cosine == pytest.approx(1.0)
    assert (row.n_a, row.n_b) == (2, 2)


def test_centroid_orthogonal_groups_cosine_zero(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    row = centroid_cosine_drift(_emb(spark, rows), "half").collect()[0]
    assert row.centroid_cosine == pytest.approx(0.0)


def test_centroid_matches_numpy(spark):
    rng = np.random.default_rng(8)
    a = rng.normal(size=(20, 8))
    b = rng.normal(size=(15, 8)) + 0.5
    rows = [(0, [float(x) for x in v]) for v in a] + [
        (1, [float(x) for x in v]) for v in b
    ]
    row = centroid_cosine_drift(_emb(spark, rows), "half").collect()[0]
    qa = np.floor(a.astype(np.float32).astype(np.float64) * 1e6).sum(axis=0)
    qb = np.floor(b.astype(np.float32).astype(np.float64) * 1e6).sum(axis=0)
    want = float(
        qa @ qb / np.sqrt((qa @ qa) * (qb @ qb))
    )
    assert row.centroid_cosine == pytest.approx(want, abs=1e-12)


def test_centroid_requires_two_groups(spark):
    rows = [(0, [1.0, 2.0])]
    with pytest.raises(ValueError):
        centroid_cosine_drift(_emb(spark, rows), "half")


def test_lorenz_uniform_is_linear(spark):
    rows = [(f"u{i:02d}", 100) for i in range(50)]
    df = spark.createDataFrame(rows, "u string, a long")
    out = sorted(
        lorenz_deciles(df, "u", "a").collect(), key=lambda r: r.decile
    )
    assert len(out) == 10
    for i, r in enumerate(out, start=1):
        assert r.cum_share == pytest.approx(i / 10)
        assert r.n_units == 5


def test_lorenz_concentrated_top_decile(spark):
    """49 users with 1 cent, one whale with 951: bottom 9 deciles hold
    tiny shares, the curve ends at exactly 1.0."""
    rows = [(f"u{i:02d}", 1) for i in range(49)] + [("whale", 951)]
    df = spark.createDataFrame(rows, "u string, a long")
    out = sorted(
        lorenz_deciles(df, "u", "a").collect(), key=lambda r: r.decile
    )
    assert out[-1].cum_share == pytest.approx(1.0)
    assert out[-2].cum_share == pytest.approx(45 / 1000)
    assert out[-1].decile_amount == 951 + 4  # whale + 4 one-cent users


def test_lorenz_monotone_and_convex(spark):
    import random

    rng = random.Random(11)
    rows = [(f"u{i:03d}", rng.randint(1, 1000)) for i in range(200)]
    df = spark.createDataFrame(rows, "u string, a long")
    out = sorted(
        lorenz_deciles(df, "u", "a").collect(), key=lambda r: r.decile
    )
    shares = [r.cum_share for r in out]
    assert all(a < b for a, b in zip(shares, shares[1:]))
    increments = [b - a for a, b in zip([0] + shares, shares)]
    # ascending rank order -> increments non-decreasing (convexity)
    assert all(
        b >= a - 1e-12 for a, b in zip(increments, increments[1:])
    )
