"""Wave 60: linear multi-touch attribution (per-(channel, k) exact
credit rows) and HHI concentration audit — credit conservation, window
semantics, closed-form concentrations."""

from __future__ import annotations

import datetime

import pytest

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    attribution_linear,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    concentration_stats,
)


def _ev(user, etype, hour, eid):
    return (
        user,
        etype,
        datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=hour),
        eid,
    )


SCHEMA = "user_id string, event_type string, ts timestamp, event_id long"


def test_linear_splits_equally(spark):
    """One purchase after view+click: each channel gets 5000 bp."""
    rows = [
        _ev("u", "view", 0, 1),
        _ev("u", "click", 1, 2),
        _ev("u", "purchase", 2, 3),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.channel: r for r in attribution_linear(df).collect()}
    assert out["view"].credit_bp == pytest.approx(5000.0)
    assert out["click"].credit_bp == pytest.approx(5000.0)
    assert out["view"].journey_len == 2


def test_linear_credit_conserved_across_conversions(spark):
    """Total credited bp = 10000 * n_attributed_conversions, whatever
    the journey shapes."""
    rows = [
        _ev("a", "view", 0, 1),
        _ev("a", "view", 1, 2),
        _ev("a", "click", 2, 3),
        _ev("a", "purchase", 3, 4),
        _ev("b", "click", 0, 5),
        _ev("b", "purchase", 1, 6),
        _ev("b", "purchase", 2, 7),  # second conversion reuses the touch
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = attribution_linear(df).collect()
    total = sum(r.credit_bp for r in out)
    assert total == pytest.approx(10000.0 * 3)


def test_linear_window_excludes_stale_touches(spark):
    """A touch older than the window is not in the journey; a purchase
    with NO in-window touch lands in the NULL-channel zero row."""
    rows = [
        _ev("u", "view", 0, 1),
        _ev("u", "purchase", 100, 2),  # 100h later, window 72h
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = attribution_linear(df, window_hours=72).collect()
    assert len(out) == 1
    r = out[0]
    assert r.channel is None
    assert r.journey_len == 0
    assert r.n_touches == 1
    assert r.credit_bp == 0.0


def test_linear_conversion_not_a_touch(spark):
    """A prior purchase does not enter another purchase's journey."""
    rows = [
        _ev("u", "purchase", 0, 1),
        _ev("u", "view", 1, 2),
        _ev("u", "purchase", 2, 3),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = attribution_linear(df).collect()
    credited = [r for r in out if r.channel is not None]
    assert {r.channel for r in credited} == {"view"}
    # first purchase has zero touches -> zero row present
    assert any(r.channel is None and r.n_touches == 1 for r in out)


def test_linear_bot_cap_prunes_user(spark):
    rows = [_ev("bot", "view", h, 100 + h) for h in range(10)] + [
        _ev("bot", "purchase", 11, 200),
        _ev("u", "click", 0, 1),
        _ev("u", "purchase", 1, 2),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = attribution_linear(df, max_user_events=5).collect()
    assert {r.channel for r in out} == {"click"}


def test_hhi_single_category_is_one(spark):
    df = spark.createDataFrame(
        [("en", "crawl")] * 7, "lang string, source string"
    )
    row = concentration_stats(df, "lang", "source").collect()[0]
    assert row.hhi == pytest.approx(1.0)
    assert row.effective_categories == pytest.approx(1.0)
    assert row.top1_share == pytest.approx(1.0)


def test_hhi_uniform_categories(spark):
    """k equal categories: hhi = 1/k, effective = k."""
    rows = [("en", f"s{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "lang string, source string")
    row = concentration_stats(df, "lang", "source").collect()[0]
    assert row.hhi == pytest.approx(0.25)
    assert row.effective_categories == pytest.approx(4.0)
    assert row.n_categories == 4
    assert row.top1_share == pytest.approx(0.25)


def test_hhi_skewed_closed_form(spark):
    """Counts 8/1/1: hhi = (64+1+1)/100 = 0.66, top1 0.8, eff 100/66."""
    rows = [("de", "a")] * 8 + [("de", "b")] + [("de", "c")]
    df = spark.createDataFrame(rows, "lang string, source string")
    row = concentration_stats(df, "lang", "source").collect()[0]
    assert row.hhi == pytest.approx(0.66)
    assert row.top1_share == pytest.approx(0.8)
    assert row.effective_categories == pytest.approx(100 / 66)


def test_hhi_group_isolation_and_partition_independence(spark):
    rows = [("en", f"s{i % 3}") for i in range(30)] + [
        ("fr", "only") for _ in range(5)
    ]
    df = spark.createDataFrame(rows, "lang string, source string")
    a = {
        r.lang: (r.n, r.hhi, r.top1_share)
        for r in concentration_stats(df, "lang", "source").collect()
    }
    b = {
        r.lang: (r.n, r.hhi, r.top1_share)
        for r in concentration_stats(
            df.repartition(16), "lang", "source"
        ).collect()
    }
    assert a == b
    assert a["fr"][1] == pytest.approx(1.0)
