"""Wave 119: Theil's U uncertainty coefficients + first-order
stochastic dominance audit — hand goldens through the registry."""

from __future__ import annotations

import datetime
import os

import pytest

import __spark_entry__ as entry_mod


def _sf_docs(spark, tmp_path, rows):
    """rows: (lang, source)."""
    sf = str(tmp_path / "sfd")
    os.makedirs(sf)
    spark.createDataFrame(
        [(i, "t", l, s) for i, (l, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_theils_u_perfect_dependence(spark, tmp_path):
    # lang is a FUNCTION of source (and vice versa): MI = H(lang) =
    # H(source) -> both coefficients exactly 1 (identical micro sums)
    sf = _sf_docs(
        spark, tmp_path,
        [("en", "web")] * 2 + [("fr", "books")] * 3,
    )
    q = entry_mod.queries()
    r = q["theils_u_lang_source"](spark, sf).collect()[0]
    assert r.n == 5
    assert r.u_lang_given_source == pytest.approx(1.0)
    assert r.u_source_given_lang == pytest.approx(1.0)
    assert r.mi_nats > 0


def test_theils_u_independence_zero(spark, tmp_path):
    # uniform 2x2: every cell term ln(obs*n/(rt*ct)) = ln(1) = 0
    sf = _sf_docs(
        spark, tmp_path,
        [("en", "web"), ("en", "books"), ("fr", "web"), ("fr", "books")],
    )
    q = entry_mod.queries()
    r = q["theils_u_lang_source"](spark, sf).collect()[0]
    assert r.mi_nats == pytest.approx(0.0)
    assert r.u_lang_given_source == pytest.approx(0.0)


def test_theils_u_degenerate_null(spark, tmp_path):
    # a single language: H(lang) = 0 -> U(lang|source) undefined (NULL)
    sf = _sf_docs(spark, tmp_path, [("en", "web"), ("en", "books")])
    q = entry_mod.queries()
    r = q["theils_u_lang_source"](spark, sf).collect()[0]
    assert r.u_lang_given_source is None
    assert r.u_source_given_lang is not None


def _sf_events(spark, tmp_path, rows):
    ts_before = datetime.datetime(2024, 1, 5, 12)
    ts_after = datetime.datetime(2024, 2, 5, 12)
    data = [
        (i, ts_after if after else ts_before, 100 + i, "click", v, "{}")
        for i, (v, after) in enumerate(rows)
    ]
    sf = str(tmp_path / "sfe")
    os.makedirs(sf)
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_dominance_clear_shift(spark, tmp_path):
    # right = left + 2: left's ECDF is above everywhere it differs ->
    # the RIGHT side first-order dominates (bigger values)
    sf = _sf_events(
        spark, tmp_path,
        [(1.0, False), (2.0, False), (3.0, True), (4.0, True)],
    )
    q = entry_mod.queries()
    r = q["dominance_value_drift"](spark, sf).collect()[0]
    assert r.pts_right_above == 0 and r.pts_left_above > 0
    assert bool(r.right_fosd) is True
    assert bool(r.left_fosd) is False


def test_dominance_crossing_neither(spark, tmp_path):
    # variance change, CDFs cross -> neither side dominates
    sf = _sf_events(
        spark, tmp_path,
        [(2.0, False), (3.0, False), (1.0, True), (4.0, True)],
    )
    q = entry_mod.queries()
    r = q["dominance_value_drift"](spark, sf).collect()[0]
    assert r.pts_left_above > 0 and r.pts_right_above > 0
    assert bool(r.right_fosd) is False and bool(r.left_fosd) is False
