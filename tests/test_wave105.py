"""Wave 105: Wilcoxon signed-rank over per-user half-window spend —
hand-computed golden through the queries() registry."""

from __future__ import annotations

import datetime
import math
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_wilcoxon_golden(spark, tmp_path):
    ts = datetime.datetime
    # span 01-01..01-11 -> mid 01-06 (first half d <= mid)
    # u1 +200, u2 -300, u3 +200 (tie), u4 0 (dropped), u5 +500
    # |d| midranks: 200,200 -> 1.5 ; 300 -> 3 ; 500 -> 4
    # W+ = 1.5+1.5+4 = 7 -> x2 = 14 ; n=4 ; T = 6
    # z = ((2*14 - 20)/4) / sqrt((2*4*5*9 - 6)/48) = 2/sqrt(7.375)
    rows = [
        (1, ts(2025, 1, 1, 9), 1, "purchase", 1.0, "{}"),
        (2, ts(2025, 1, 11, 9), 1, "purchase", 3.0, "{}"),
        (3, ts(2025, 1, 3, 9), 2, "purchase", 4.0, "{}"),
        (4, ts(2025, 1, 9, 9), 2, "purchase", 1.0, "{}"),
        (5, ts(2025, 1, 2, 9), 3, "purchase", 1.0, "{}"),
        (6, ts(2025, 1, 10, 9), 3, "purchase", 3.0, "{}"),
        (7, ts(2025, 1, 4, 9), 4, "purchase", 2.0, "{}"),
        (8, ts(2025, 1, 8, 9), 4, "purchase", 2.0, "{}"),
        (9, ts(2025, 1, 10, 9), 5, "purchase", 5.0, "{}"),
    ]
    sf = _sf(spark, tmp_path, rows)
    r = entry_mod.queries()["wilcoxon_user_halves"](spark, sf).collect()[0]
    assert (r.n_pairs, r.n_nonzero, r.w_plus_x2, r.tie_term) == (
        5, 4, 14, 6,
    )
    assert r.z_wilcoxon == pytest.approx(2 / math.sqrt(7.375), abs=1e-9)


def test_wilcoxon_all_zero_diffs_null(spark, tmp_path):
    ts = datetime.datetime
    rows = [
        (1, ts(2025, 1, 1, 9), 1, "purchase", 2.0, "{}"),
        (2, ts(2025, 1, 11, 9), 1, "purchase", 2.0, "{}"),
    ]
    sf = _sf(spark, tmp_path, rows)
    r = entry_mod.queries()["wilcoxon_user_halves"](spark, sf).collect()[0]
    assert (r.n_pairs, r.n_nonzero, r.w_plus_x2) == (1, 0, 0)
    assert r.z_wilcoxon is None
