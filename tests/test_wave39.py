"""Wave-39 operators: Cohen's kappa (perfect/chance/degenerate
agreement), calibration bins (exact integer bin edges, calibrated vs
miscalibrated), hit-rate@k (tie-break determinism, miss handling),
robust-z anomalies (median/MAD closed forms, flat series)."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    daily_anomaly_robust_z,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    calibration_bins,
    cohens_kappa,
    hitrate_at_k,
)


def _bools(spark, pairs):
    return spark.createDataFrame(pairs, "a boolean, b boolean")


def test_kappa_perfect_agreement(spark):
    [r] = cohens_kappa(
        _bools(spark, [(True, True)] * 3 + [(False, False)] * 7), "a", "b"
    ).collect()
    assert r.po == 1.0 and math.isclose(r.kappa, 1.0)
    assert r.n_both_true == 3 and r.n_both_false == 7
    assert r.n_only_a == 0 and r.n_only_b == 0


def test_kappa_chance_level_is_zero(spark):
    # independent raters at 50/50: po == pe -> kappa == 0
    pairs = [
        (True, True), (True, False), (False, True), (False, False),
    ] * 5
    [r] = cohens_kappa(_bools(spark, pairs), "a", "b").collect()
    assert math.isclose(r.po, 0.5) and math.isclose(r.pe, 0.5)
    assert math.isclose(r.kappa, 0.0)


def test_kappa_degenerate_all_same_cell(spark):
    # both raters always true: pe == 1 -> kappa NULL, not div-by-zero
    [r] = cohens_kappa(_bools(spark, [(True, True)] * 4), "a", "b").collect()
    assert r.pe == 1.0 and r.kappa is None


def test_calibration_bins_exact_edges(spark):
    # den = 10: num 0..9 -> score num/10; n_bins=5 -> bin = num // 2
    rows = [(i, 10, i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "num long, den long, out boolean")
    got = {
        r.bin: r
        for r in calibration_bins(df, "num", "den", "out", n_bins=5).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    assert all(got[b].n == 2 for b in got)
    # bin 2 holds num 4 (neg) and 5 (pos)
    assert got[2].n_pos == 1 and math.isclose(got[2].frac_pos, 0.5)
    assert math.isclose(got[2].mean_score, (4 + 5) / (2 * 10.0))
    # perfectly separable outcome: bins 0,1 pure negative; 3,4 pure positive
    assert got[0].n_pos == 0 and got[4].n_pos == 2


def test_calibration_top_edge_clamped(spark):
    # num == den -> raw bin n_bins, clamped into the last bin
    df = spark.createDataFrame(
        [(10, 10, True), (0, 10, False)], "num long, den long, out boolean"
    )
    got = {r.bin: r for r in calibration_bins(df, "num", "den", "out").collect()}
    assert set(got) == {0, 9}
    assert got[9].n == 1 and got[9].n_pos == 1


def test_hitrate_at_k_tiebreak_and_misses(spark):
    # history counts: item 1 x3, 2 x2, 3 x2, 4 x1 ; k=2 -> top = {1, 2}
    # (3 ties with 2 on count; item asc keeps 2)
    hist = spark.createDataFrame(
        [(1,)] * 3 + [(2,)] * 2 + [(3,)] * 2 + [(4,)], "item long"
    )
    evals = spark.createDataFrame([(1,), (2,), (3,), (9,)], "item long")
    [r] = hitrate_at_k(hist, evals, "item", k=2).collect()
    assert r.n_eval == 4 and r.n_hits == 2
    assert math.isclose(r.hitrate, 0.5)


def test_robust_z_closed_form(spark):
    base = datetime.datetime(2024, 1, 1, 6)
    # daily purchase counts: 1, 2, 3, 10  -> median 2.5, MAD 1.0
    counts = {0: 1, 1: 2, 2: 3, 3: 10}
    rows = []
    eid = 0
    for d, n in counts.items():
        for _ in range(n):
            eid += 1
            rows.append((eid, base + datetime.timedelta(days=d), "purchase", 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {r.day.day: r.robust_z for r in daily_anomaly_robust_z(df).collect()}
    med, mad = 2.5, 1.0
    for d, n in counts.items():
        assert math.isclose(got[d + 1], (n - med) / (1.4826 * mad)), d


def test_robust_z_flat_series_null(spark):
    base = datetime.datetime(2024, 1, 1, 6)
    rows = [
        (i, base + datetime.timedelta(days=i), "purchase", 1.0)
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = daily_anomaly_robust_z(df).collect()
    assert len(got) == 4 and all(r.robust_z is None for r in got)
