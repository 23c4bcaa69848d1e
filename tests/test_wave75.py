"""Wave 75: uplift decile terms (incremental conversions) and
calendar-correct peak detection."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    daily_peaks,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    uplift_decile_terms,
)


def test_uplift_detects_planted_heterogeneity(spark):
    """High-score units convert ONLY when treated (uplift there);
    low-score units convert regardless (no uplift). The top decile's
    term must be positive and the bottom's ~0."""
    rows = []
    uid = 0
    # low scores: converts 50% EXACTLY independent of treatment
    # (t keys on i%2, y on (i//2)%2 — orthogonal bits)
    for i in range(200):
        uid += 1
        rows.append((10 + i % 5, f"u{uid:04d}", i % 2 == 0, (i // 2) % 2 == 0))
    # high scores: treated always convert, controls never
    for i in range(200):
        uid += 1
        treated = i % 2 == 0
        rows.append((100000 + i, f"u{uid:04d}", treated, treated))
    df = spark.createDataFrame(rows, "score long, id string, t boolean, y boolean")
    out = {
        r.decile: r
        for r in uplift_decile_terms(df, "score", "t", "y", id_col="id").collect()
    }
    top = out[max(out)]
    bottom = out[min(out)]
    # top decile: all treated convert, all controls do not
    assert top.uplift_term == pytest.approx(top.conv_treated)
    assert top.uplift_term > 10
    # bottom decile: conversions exactly independent of treatment
    assert bottom.uplift_term == pytest.approx(0.0)


def test_uplift_counts_exact(spark):
    rows = [
        (1, "a", True, True),
        (2, "b", True, False),
        (3, "c", False, True),
        (4, "d", False, False),
    ]
    df = spark.createDataFrame(rows, "score long, id string, t boolean, y boolean")
    out = uplift_decile_terms(df, "score", "t", "y", n_tiles=1, id_col="id").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_treated, r.n_control) == (2, 2)
    assert (r.conv_treated, r.conv_control) == (1, 1)
    assert r.uplift_term == pytest.approx(0.0)  # 1 - 1*(2/2)


def test_uplift_no_controls_null_term(spark):
    rows = [(i, f"u{i}", True, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "score long, id string, t boolean, y boolean")
    out = uplift_decile_terms(df, "score", "t", "y", n_tiles=1, id_col="id").collect()
    assert out[0].uplift_term is None


def test_uplift_requires_id(spark):
    df = spark.createDataFrame([(1, True, True)], "score long, t boolean, y boolean")
    with pytest.raises(ValueError):
        uplift_decile_terms(df, "score", "t", "y")


def _daily(spark, vals, skip=None):
    d0 = datetime.date(2024, 1, 1)
    rows = [
        (d0 + datetime.timedelta(days=i), v)
        for i, v in enumerate(vals)
        if not (skip and i in skip)
    ]
    return spark.createDataFrame(rows, "day date, x long")


def test_peaks_simple(spark):
    vals = [1, 5, 2, 8, 3]
    out = {str(r.day): r for r in daily_peaks(_daily(spark, vals)).collect()}
    peaks = {d for d, r in out.items() if r.is_peak}
    assert peaks == {"2024-01-02", "2024-01-04"}
    assert out["2024-01-02"].prominence == 3  # 5 - max(1, 2)
    assert out["2024-01-04"].prominence == 5  # 8 - max(2, 3)


def test_peaks_gap_blocks(spark):
    """Day 3 removed: day 2 has no right CALENDAR neighbor and day 4
    has no left one — neither can peak even if larger than what's
    around them in ROW order."""
    vals = [1, 2, 9, 0, 9, 2, 1]
    out = {
        str(r.day): r
        for r in daily_peaks(_daily(spark, vals, skip={3})).collect()
    }
    assert not out["2024-01-03"].is_peak  # value 9, gap on the right
    assert not out["2024-01-05"].is_peak  # value 9, gap on the left
    assert out["2024-01-03"].next_x is None


def test_peaks_plateau_not_peak(spark):
    vals = [1, 5, 5, 1]
    out = daily_peaks(_daily(spark, vals)).collect()
    assert not any(r.is_peak for r in out)  # strict inequality both sides


def test_peaks_endpoints_excluded(spark):
    vals = [9, 1, 2]
    out = {str(r.day): r for r in daily_peaks(_daily(spark, vals)).collect()}
    assert not out["2024-01-01"].is_peak  # no left neighbor
