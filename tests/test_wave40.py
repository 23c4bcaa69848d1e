"""Wave-40 operators: exact ROC-AUC (tie midranks vs pairwise brute
force), decile lift (closed forms, gains monotonicity), PSI bands
(symmetry, zero-shift, empty-side NULL)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    decile_lift,
    exact_auc,
    psi_bands,
)


def _auc_brute(pairs):
    """Pairwise AUC: P(score_pos > score_neg) + 0.5 P(equal)."""
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    if not pos or not neg:
        return None
    wins = sum(1 for a in pos for b in neg if a > b)
    ties = sum(1 for a in pos for b in neg if a == b)
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_auc_matches_pairwise_with_ties(spark):
    pairs = [
        (10, True), (10, False), (5, False), (20, True), (20, True),
        (1, False), (5, True), (7, False), (20, False), (3, False),
    ]
    df = spark.createDataFrame(pairs, "s long, lab boolean")
    [r] = exact_auc(df, "s", "lab", bucket_width=4).collect()
    assert r.n == 10 and r.n_pos == 4 and r.n_neg == 6
    assert math.isclose(r.auc, _auc_brute(pairs), rel_tol=1e-12)


def test_auc_perfect_and_inverted(spark):
    perfect = [(i, i >= 5) for i in range(10)]
    [r] = exact_auc(
        spark.createDataFrame(perfect, "s long, lab boolean"), "s", "lab"
    ).collect()
    assert r.auc == 1.0
    inverted = [(i, i < 5) for i in range(10)]
    [r] = exact_auc(
        spark.createDataFrame(inverted, "s long, lab boolean"), "s", "lab"
    ).collect()
    assert r.auc == 0.0


def test_auc_single_class_null(spark):
    df = spark.createDataFrame([(1, True), (2, True)], "s long, lab boolean")
    [r] = exact_auc(df, "s", "lab").collect()
    assert r.auc is None and r.n_neg == 0


def test_auc_random_matches_brute(spark):
    import random

    rng = random.Random(40)
    pairs = [(rng.randrange(0, 30), rng.random() < 0.3) for _ in range(200)]
    df = spark.createDataFrame(pairs, "s long, lab boolean")
    [r] = exact_auc(df, "s", "lab", bucket_width=7).collect()
    assert math.isclose(r.auc, _auc_brute(pairs), rel_tol=1e-12)


def test_decile_lift_separable(spark):
    # scores 0..99, positives are exactly the top 20 scores
    rows = [(s, s, s >= 80) for s in range(100)]
    df = spark.createDataFrame(rows, "s long, id long, lab boolean")
    got = {r.tile: r for r in decile_lift(df, "s", "lab", "id").collect()}
    assert set(got) == set(range(10))
    assert all(got[t].n == 10 for t in got)
    # top two tiles hold all positives
    assert got[0].n_pos == 10 and got[1].n_pos == 10
    assert all(got[t].n_pos == 0 for t in range(2, 10))
    # lift of a pure tile = 1 / base_rate = 5.0
    assert math.isclose(got[0].lift, 5.0)
    assert math.isclose(got[0].cum_gain, 0.5)
    assert math.isclose(got[1].cum_gain, 1.0)
    assert math.isclose(got[9].cum_gain, 1.0)
    # gains are monotone non-decreasing in tile order
    gains = [got[t].cum_gain for t in range(10)]
    assert gains == sorted(gains)


def test_psi_bands_zero_shift_and_symmetry(spark):
    # identical distributions in both periods -> every term 0.0
    rows = [(b, p) for b in (0, 50, 100) for p in (0, 1) for _ in range(4)]
    df = spark.createDataFrame(rows, "band long, p int")
    got = {r.band: r for r in psi_bands(df, "band", "p").collect()}
    assert all(got[b].psi_term == 0.0 for b in got)
    # shifted distribution: terms positive on both shifted bands
    rows = [(0, 0)] * 8 + [(50, 0)] * 2 + [(0, 1)] * 2 + [(50, 1)] * 8
    df = spark.createDataFrame(rows, "band long, p int")
    got = {r.band: r for r in psi_bands(df, "band", "p").collect()}
    pa, pb = 0.8, 0.2
    expect = round((pa - pb) * math.log(pa / pb), 6)
    assert math.isclose(got[0].psi_term, expect)
    assert math.isclose(got[50].psi_term, expect)  # symmetric shift


def test_psi_bands_empty_side_null(spark):
    rows = [(0, 0)] * 3 + [(50, 1)] * 3
    df = spark.createDataFrame(rows, "band long, p int")
    got = {r.band: r for r in psi_bands(df, "band", "p").collect()}
    assert got[0].psi_term is None and got[50].psi_term is None
    assert got[0].n_a == 3 and got[0].n_b == 0
