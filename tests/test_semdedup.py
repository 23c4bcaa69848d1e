"""Semantic dedup (SemDeDup-shape): planted near-duplicates are detected
and dropped; the drop set matches an exact numpy reference over the same
quantized space; recall vs brute-force exact pairs is high."""

from __future__ import annotations

import math

import numpy as np

from hmpps_digital_prison_reporting_glue_poc_spark.operators import similarity as sim

DIM = 16
N_CLUSTERS = 4
THRESHOLD = 0.95
SCALE = 1000


def _corpus():
    """20 unit base vectors + a near-identical (cosine ~0.999) copy of
    each at id+100, plus 5 standalone vectors."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pert = base + rng.normal(scale=0.01, size=base.shape)
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    lone = rng.normal(size=(5, DIM))
    lone /= np.linalg.norm(lone, axis=1, keepdims=True)
    rows = {}
    for i, v in enumerate(base):
        rows[i] = v
    for i, v in enumerate(pert):
        rows[100 + i] = v
    for i, v in enumerate(lone):
        rows[200 + i] = v
    return rows


def _reference(rows):
    """Exact replay of the operator's arithmetic: md5 centroids, integer
    quantization, first-min assignment, int-dot cosine."""
    ids = sorted(rows)
    mat = np.vstack([rows[i] for i in ids]).astype(np.float64)
    q = np.floor(mat * SCALE).astype(np.int64)
    cc = sim.md5_coarse_centroids(N_CLUSTERS, DIM, SCALE)
    d2 = ((q[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1)
    norms = (q * q).sum(axis=1)
    dropped = set()
    for bi in range(len(ids)):
        for ai in range(bi):
            if cl[ai] != cl[bi] or norms[ai] == 0 or norms[bi] == 0:
                continue
            cos = float((q[ai] * q[bi]).sum()) / (
                math.sqrt(float(norms[ai])) * math.sqrt(float(norms[bi]))
            )
            if cos >= THRESHOLD:
                dropped.add(ids[bi])
                break
    clusters = {ids[i]: int(cl[i]) for i in range(len(ids))}
    return clusters, dropped


def test_semantic_dedup_matches_exact_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(rows.items())],
        "vec_id long, embedding array<double>",
    )
    out = sim.semantic_dedup(
        spark, df, n_clusters=N_CLUSTERS, threshold=THRESHOLD
    )
    got = {r.vec_id: (r.cluster_id, r.kept) for r in out.collect()}
    clusters, dropped = _reference(rows)

    assert set(got) == set(rows)  # one verdict per vector
    assert {i for i, (_, kept) in got.items() if not kept} == dropped
    assert {i: c for i, (c, _) in got.items()} == clusters
    # the survivor of every duplicate group is its lowest id
    assert all(i not in dropped or i - 100 in rows for i in dropped)


def test_semantic_dedup_recall_vs_exact_pairs(spark):
    """Every planted pair is an exact near-dup pair; clustering must
    recover nearly all of them (a pair is only missed when the two copies
    straddle a centroid boundary)."""
    rows = _corpus()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(rows.items())],
        "vec_id long, embedding array<double>",
    )
    # brute-force exact pairs on the raw float vectors
    exact = {
        (r.id_a, r.id_b)
        for r in sim.cosine_pairs_above(
            df, threshold=THRESHOLD, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    planted = {(i, 100 + i) for i in range(20)}
    assert planted <= exact  # the construction really planted near-dups

    out = sim.semantic_dedup(
        spark, df, n_clusters=N_CLUSTERS, threshold=THRESHOLD
    )
    dropped = {r.vec_id for r in out.collect() if not r.kept}
    recovered = {(a, b) for (a, b) in exact if b in dropped}
    recall = len(recovered) / len(exact)
    assert recall >= 0.8, f"recall {recall}: {sorted(exact - recovered)}"
    # and nothing is dropped without an exact-pair justification
    justified = {b for (_, b) in exact}
    assert dropped <= justified
