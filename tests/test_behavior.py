"""Funnel / cohort behavioral analytics (operators/behavior.py)."""

from __future__ import annotations

import datetime

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    cohort_retention,
    dedup_time_window,
    event_transitions,
    funnel_conversion,
    rolling_distinct_users,
)


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_funnel_requires_stage_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # user 2: clicked BEFORE viewing -> stops at view
        (2, "click", _ts(1)), (2, "view", _ts(2)),
        # user 3: view+click, purchase before click -> stops at click
        (3, "view", _ts(1)), (3, "purchase", _ts(1, 12)), (3, "click", _ts(2)),
        # user 4: never viewed -> counts nowhere
        (4, "purchase", _ts(1)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.stage: r.n_users
        for r in funnel_conversion(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_is_not_after(spark):
    # strictly-after semantics: simultaneous click does not complete stage 2
    rows = [(1, "view", _ts(1)), (1, "click", _ts(1))]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.stage: r.n_users for r in funnel_conversion(ev, ["view", "click"]).collect()
    }
    assert got == {"view": 1, "click": 0}


def test_cohort_retention_offsets(spark):
    rows = [
        # user 1 first active week of Jan 1 (Monday), returns in week of Jan 8
        (1, _ts(2)), (1, _ts(9)),
        # user 2 first active week of Jan 8, never returns
        (2, _ts(10)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_period), r.period_offset): r.n_active_users
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_event_transitions_counts_and_ordering(spark):
    rows = [
        (1, 1, "view", _ts(1)),
        (2, 1, "click", _ts(2)),
        (3, 1, "view", _ts(3)),
        (4, 2, "view", _ts(1)),
        (5, 2, "click", _ts(2)),
        # same ts as event 5: event_id breaks the tie -> click then view
        (6, 2, "view", _ts(2)),
        (7, 3, "purchase", _ts(1)),  # single event: no transition
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        (r.from_type, r.to_type): r.n_transitions
        for r in event_transitions(ev).collect()
    }
    assert got == {("view", "click"): 2, ("click", "view"): 2}


def test_dedup_time_window_lag_semantics(spark):
    rows = [
        (1, 1, "view", _ts(1, 0)),                       # kept (first)
        (2, 1, "view", datetime.datetime(2024, 1, 1, 0, 0, 30)),   # 30s gap: dropped
        (3, 1, "view", datetime.datetime(2024, 1, 1, 0, 1, 31)),   # 61s after #2: kept
        (4, 1, "click", datetime.datetime(2024, 1, 1, 0, 0, 10)),  # other type: kept
        (5, 2, "view", datetime.datetime(2024, 1, 1, 0, 0, 5)),    # other user: kept
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    kept = sorted(r.event_id for r in dedup_time_window(ev, gap_seconds=60).collect())
    assert kept == [1, 3, 4, 5]


def test_rolling_distinct_users_window(spark):
    rows = [
        (1, 1, "view", _ts(1)),
        (2, 2, "view", _ts(1)),
        (3, 1, "view", _ts(5)),   # day 5: users {1} new + {1,2} trailing
        (4, 3, "view", _ts(20)),  # far later: window contains only day 20
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        str(r.day): r.n_active_users
        for r in rolling_distinct_users(ev, window_days=7).collect()
    }
    # day 1: {1,2}; day 5: day-1 pairs still inside 7-day window -> {1,2};
    # day 20: only user 3
    assert got == {"2024-01-01": 2, "2024-01-05": 2, "2024-01-20": 1}


def test_funnel_single_window_shuffle(spark):
    # All stage windows share one partition spec -> exactly one Exchange
    # below the Window in the physical plan.
    rows = [(1, "view", _ts(1)), (1, "click", _ts(2))]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    plan = (
        funnel_conversion(ev, ["view", "click", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


def test_dialog_turn_stats(spark):
    import datetime

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
        dialog_turn_stats,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # conv 1: user/assistant alternating, 10s gaps — clean dialog
        (1, "user", t0, 1),
        (1, "assistant", t0 + datetime.timedelta(seconds=10), 2),
        (1, "user", t0 + datetime.timedelta(seconds=20), 3),
        # conv 2: double user turn -> one violation
        (2, "user", t0, 4),
        (2, "user", t0 + datetime.timedelta(seconds=5), 5),
        (2, "assistant", t0 + datetime.timedelta(seconds=10), 6),
        # conv 3: single turn -> NULL mean gap
        (3, "system", t0, 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = {r.user_id: r for r in dialog_turn_stats(df).collect()}
    assert out[1].n_turns == 3 and out[1].n_role_violations == 0
    assert out[1].n_roles == 2 and out[1].mean_gap_seconds == 10.0
    assert out[2].n_role_violations == 1
    assert out[3].n_turns == 1 and out[3].mean_gap_seconds is None


def test_dialog_turn_stats_max_turns_drops_bot_conversation(spark):
    import datetime

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
        dialog_turn_stats,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, "user", t0, 1), (1, "assistant", t0 + datetime.timedelta(seconds=5), 2)]
    rows += [(99, "user", t0 + datetime.timedelta(seconds=i), 100 + i)
             for i in range(50)]  # bot: 50 turns
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = {r.user_id for r in dialog_turn_stats(df, max_turns=10).collect()}
    assert out == {1}
    # non-binding cap keeps everything identical
    a = sorted(map(tuple, dialog_turn_stats(df).collect()))
    b = sorted(map(tuple, dialog_turn_stats(df, max_turns=1000).collect()))
    assert a == b
