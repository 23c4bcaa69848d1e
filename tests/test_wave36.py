"""Wave-36 operators: point-in-time features (leakage-free cutoff),
last-touch attribution (window cutoff + channel credit), l-diversity
(diverse vs homogeneous groups), discrete inter-purchase hazard table
(at-risk monotonicity, day binning)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    attribution_last_touch,
    pit_features,
    time_to_next_hazard,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.profiling import (
    l_diversity_audit,
)


def _events(spark, rows):
    # rows: (event_id, user_id, type, seconds_offset, value)
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, u, t, base + datetime.timedelta(seconds=s), v)
            for (i, u, t, s, v) in rows
        ],
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )


def test_pit_features_strict_cutoff(spark):
    # u1: view(0, 1.00), purchase(10, 2.00), view(20, 3.00), purchase(30, 4.00)
    ev = _events(
        spark,
        [
            (1, 1, "view", 0, 1.00),
            (2, 1, "purchase", 10, 2.00),
            (3, 1, "view", 20, 3.00),
            (4, 1, "purchase", 30, 4.00),
        ],
    )
    got = {r.event_id: r for r in pit_features(ev).collect()}
    # first purchase sees ONLY the earlier view — not itself, not later.
    assert got[2].n_prior_events == 1
    assert got[2].n_prior_views == 1
    assert got[2].cents_prior_value == 100
    assert got[2].last_prior_type == "view"
    # second purchase sees view+purchase+view strictly before it.
    assert got[4].n_prior_events == 3
    assert got[4].n_prior_views == 2
    assert got[4].cents_prior_value == 100 + 200 + 300
    assert got[4].last_prior_type == "view"


def test_pit_features_first_event_zeroes(spark):
    ev = _events(spark, [(1, 7, "purchase", 0, 5.00)])
    [r] = pit_features(ev).collect()
    assert (r.n_prior_events, r.n_prior_views, r.cents_prior_value) == (
        0,
        0,
        0,
    )
    assert r.last_prior_type is None


def test_pit_features_same_ts_tiebreak_on_id(spark):
    # two events at the identical timestamp: id order decides "earlier".
    ev = _events(
        spark,
        [(1, 1, "view", 0, 1.00), (2, 1, "purchase", 0, 2.00)],
    )
    got = {r.event_id: r for r in pit_features(ev).collect()}
    assert got[2].n_prior_events == 1
    assert got[2].last_prior_type == "view"


def test_attribution_credits_last_touch_within_window(spark):
    hours = 3600
    ev = _events(
        spark,
        [
            (1, 1, "view", 0, 0.0),
            (2, 1, "click", 10, 0.0),
            (3, 1, "purchase", 20, 10.00),  # credited to click (latest)
            (4, 2, "view", 0, 0.0),
            # 100h later -> outside the 72h window, uncredited
            (5, 2, "purchase", 100 * hours, 20.00),
        ],
    )
    got = {r.channel: r for r in attribution_last_touch(ev).collect()}
    assert set(got) == {"click"}
    assert got["click"].n_conversions == 1
    assert got["click"].cents_value == 1000
    assert got["click"].sum_lag_us == 10 * 1_000_000


def test_attribution_skips_prior_conversions_as_touches(spark):
    # the touch before the 2nd purchase is the 1st purchase -> must NOT be
    # a channel; credit goes to the earlier click instead.
    ev = _events(
        spark,
        [
            (1, 1, "click", 0, 0.0),
            (2, 1, "purchase", 10, 1.00),
            (3, 1, "purchase", 20, 2.00),
        ],
    )
    got = {r.channel: r for r in attribution_last_touch(ev).collect()}
    assert set(got) == {"click"}
    assert got["click"].n_conversions == 2
    assert got["click"].cents_value == 300


def test_l_diversity_flags_homogeneous_group(spark):
    rows = [("a", 1), ("a", 1), ("a", 1), ("b", 1), ("b", 2)]
    df = spark.createDataFrame(rows, "qi string, sensitive long")
    got = {r.qi: r for r in l_diversity_audit(df, ["qi"], "sensitive", l=2).collect()}
    # group a is 3-anonymous but 1-diverse: k-anonymity would pass it,
    # l-diversity must flag it.
    assert got["a"].n_rows == 3
    assert got["a"].n_distinct_sensitive == 1
    assert not got["a"].diverse
    assert got["b"].n_distinct_sensitive == 2
    assert got["b"].diverse


def test_hazard_table_counts_and_at_risk_monotone(spark):
    day = 86400
    # u1 purchases at day 0, 1, 3 -> gaps 1, 2; u2 at day 0, 2 -> gap 2.
    ev = _events(
        spark,
        [
            (1, 1, "purchase", 0, 0.0),
            (2, 1, "purchase", 1 * day, 0.0),
            (3, 1, "purchase", 3 * day, 0.0),
            (4, 2, "purchase", 0, 0.0),
            (5, 2, "purchase", 2 * day, 0.0),
            (6, 1, "view", 5, 0.0),  # non-target ignored
        ],
    )
    got = {r.gap_days: r for r in time_to_next_hazard(ev).collect()}
    assert got[1].n_events == 1 and got[1].n_at_risk == 3
    assert got[2].n_events == 2 and got[2].n_at_risk == 2
    # at-risk counts are non-increasing in gap_days by construction
    risks = [r.n_at_risk for r in sorted(got.values(), key=lambda r: r.gap_days)]
    assert risks == sorted(risks, reverse=True)


def test_hazard_day_binning_floors_partial_days(spark):
    # 1.5 days -> gap_day 1 (integer floor of the microsecond delta)
    ev = _events(
        spark,
        [
            (1, 1, "purchase", 0, 0.0),
            (2, 1, "purchase", int(1.5 * 86400), 0.0),
        ],
    )
    [r] = time_to_next_hazard(ev).collect()
    assert r.gap_days == 1 and r.n_events == 1 and r.n_at_risk == 1


def test_pit_features_max_user_events_cap(spark):
    ev = _events(
        spark,
        [(i, 1, "view" if i % 2 else "purchase", i, 1.0) for i in range(10)]
        + [(100, 2, "view", 0, 1.0), (101, 2, "purchase", 5, 2.0)],
    )
    # cap below user 1's event count: user 1 dropped entirely, user 2 kept
    got = pit_features(ev, max_user_events=5).collect()
    assert {r.user_id for r in got} == {2}
    # non-binding cap: identical to the uncapped result
    capped = pit_features(ev, max_user_events=1000).collect()
    uncapped = pit_features(ev).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))


def test_attribution_max_user_events_cap(spark):
    ev = _events(
        spark,
        [(1, 1, "view", 0, 1.0), (2, 1, "purchase", 10, 5.0)]
        + [(i + 10, 2, "view", i, 1.0) for i in range(8)]
        + [(99, 2, "purchase", 100, 3.0)],
    )
    got = attribution_last_touch(ev, max_user_events=5).collect()
    # user 2 (9 events) dropped; user 1's purchase credited to 'view'
    assert len(got) == 1 and got[0].channel == "view"
    assert got[0].n_conversions == 1 and got[0].cents_value == 500
    capped = attribution_last_touch(ev, max_user_events=1000).collect()
    uncapped = attribution_last_touch(ev).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
