"""Wave 112: drift-functional completions — Kuiper V (two-sided
supremum), density-space TV + squared Hellinger, and coordinate-sliced
per-dimension W1 over embeddings — hand-computed goldens through the
queries() registry, plus the empty-side NULL contract."""

from __future__ import annotations

import datetime
import math
import os

import pytest

import __spark_entry__ as entry_mod


def _sf(spark, tmp_path, rows):
    """rows: (value, after_split) — after_split=True lands past the
    2024-01-20 wrapper split."""
    ts_before = datetime.datetime(2024, 1, 5, 12)
    ts_after = datetime.datetime(2024, 2, 5, 12)
    data = [
        (i, ts_after if after else ts_before, 100 + i, "click", v, "{}")
        for i, (v, after) in enumerate(rows)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def _sf_emb(spark, tmp_path, rows):
    """rows: (vec_id, embedding list[float], label)."""
    sf = str(tmp_path / "sfe")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


def test_kuiper_golden_vs_ks(spark, tmp_path):
    # left = {1, 3}, right = {2, 4} (cents 100/200/300/400); n1=n2=2
    # grid d = f1*n2 - f2*n1: at 100: 2-0=2; 200: 2-2=0; 300: 4-2=2;
    # 400: 0. D+ = 2/4 = 0.5; D- = max(-d)/4 = 0 -> V = 0.5.
    sf = _sf(
        spark, tmp_path,
        [(1.0, False), (3.0, False), (2.0, True), (4.0, True)],
    )
    q = entry_mod.queries()
    r = q["kuiper_value_drift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right) == (2, 2)
    assert r.d_plus == pytest.approx(0.5)
    assert r.d_minus == pytest.approx(0.0)
    assert r.kuiper_v == pytest.approx(0.5)


def test_kuiper_symmetric_spread_beats_ks(spark, tmp_path):
    # A variance change: left = {2, 3}, right = {1, 4}. ECDFs cross —
    # F2 leads below the center, F1 leads above — so KS sees only one
    # side (D = 0.5) while Kuiper scores both: d at cents
    # 100: 0-2=-2; 200: 2-2=0... recompute: f1 cum over grid
    # {100,200,300,400}: 0,1,2,2; f2: 1,1,1,2; d = f1*2 - f2*2:
    # -2, 0, 2, 0 -> D+ = 2/4 = .5, D- = 2/4 = .5, V = 1.0.
    sf = _sf(
        spark, tmp_path,
        [(2.0, False), (3.0, False), (1.0, True), (4.0, True)],
    )
    q = entry_mod.queries()
    r = q["kuiper_value_drift"](spark, sf).collect()[0]
    assert r.d_plus == pytest.approx(0.5)
    assert r.d_minus == pytest.approx(0.5)
    assert r.kuiper_v == pytest.approx(1.0)


def test_hellinger_tv_golden(spark, tmp_path):
    # left = {1, 1, 2, 3}, right = {1, 2, 2, 4}: p = (2,1,1,0)/4,
    # q = (1,2,0,1)/4. TV = (1/2)(1/4 + 1/4 + 1/4 + 1/4) = 0.5.
    # BC = sum sqrt(p*q) = (sqrt2 + sqrt2)/4; H2 = 1 - sqrt(2)/2.
    sf = _sf(
        spark, tmp_path,
        [(1.0, False), (1.0, False), (2.0, False), (3.0, False),
         (1.0, True), (2.0, True), (2.0, True), (4.0, True)],
    )
    q = entry_mod.queries()
    r = q["hellinger_tv_value_drift"](spark, sf).collect()[0]
    assert (r.n_left, r.n_right) == (4, 4)
    assert r.tv_d == pytest.approx(0.5)
    assert r.hellinger_h2 == pytest.approx(
        round(1.0 - math.sqrt(2.0) / 2.0, 6)
    )


def test_hellinger_tv_identical_sides_zero(spark, tmp_path):
    sf = _sf(
        spark, tmp_path,
        [(1.0, False), (2.0, False), (1.0, True), (2.0, True)],
    )
    q = entry_mod.queries()
    r = q["hellinger_tv_value_drift"](spark, sf).collect()[0]
    assert r.tv_d == pytest.approx(0.0)
    assert r.hellinger_h2 == pytest.approx(0.0)


def test_empty_side_nulls(spark, tmp_path):
    # everything lands BEFORE the split: right side empty -> NULL stats
    sf = _sf(spark, tmp_path, [(1.0, False), (2.0, False)])
    q = entry_mod.queries()
    k = q["kuiper_value_drift"](spark, sf).collect()[0]
    assert k.kuiper_v is None and k.d_plus is None and k.d_minus is None
    h = q["hellinger_tv_value_drift"](spark, sf).collect()[0]
    assert h.tv_d is None and h.hellinger_h2 is None


def test_sliced_w1_golden(spark, tmp_path):
    # 2 dims audited here (embeddings are 2-wide; the slice takes
    # min(8, len)); left = labels {0}, right = labels {9}.
    # dim 1: left {0.1, 0.2}, right {0.2, 0.3} -> unit shift 0.1
    # dim 2: identical on both sides -> W1 = 0
    rows = [
        (0, [0.1, 0.5], 0),
        (1, [0.2, 0.6], 0),
        (2, [0.2, 0.5], 9),
        (3, [0.3, 0.6], 9),
    ]
    sf = _sf_emb(spark, tmp_path, rows)
    q = entry_mod.queries()
    out = {
        r.dim: r
        for r in q["sliced_w1_embedding_drift"](spark, sf).collect()
    }
    assert set(out) == {1, 2}
    assert out[1].w1 == pytest.approx(0.1, abs=1e-9)
    assert out[2].w1 == pytest.approx(0.0)
    assert (out[1].n_left, out[1].n_right) == (2, 2)


def test_sliced_w1_null_rows_dropped(spark, tmp_path):
    # NULL embedding / NULL label rows are filtered, not crashed on
    rows = [
        (0, [0.1, 0.5], 0),
        (1, None, 0),
        (2, [0.2, 0.5], None),
        (3, [0.3, 0.6], 9),
    ]
    sf = _sf_emb(spark, tmp_path, rows)
    q = entry_mod.queries()
    out = {
        r.dim: r
        for r in q["sliced_w1_embedding_drift"](spark, sf).collect()
    }
    assert out[1].n_left == 1 and out[1].n_right == 1
