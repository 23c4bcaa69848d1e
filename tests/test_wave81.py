"""Wave 81: composed user health mart — hand-case correctness across
all four families and the single-scan lineage-cut claim."""

from __future__ import annotations

import os

from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark  # noqa: F401

import __spark_entry__ as entry_mod


def test_user_health_mart_hand_case(spark):
    """sf0.001 smoke with cross-checks between the mart and the
    independent single-family queries it composes."""
    sf = "/root/testdata/sf0.001"
    mart = {
        r.user_id: r
        for r in entry_mod.queries()["user_health_mart"](spark, sf).collect()
    }
    # cross-check sessions against the standalone sessionize labels
    sess = entry_mod.queries()["sessionize_events"](spark, sf)
    import pyspark.sql.functions as F

    sess_counts = {
        r.user_id: r.n
        for r in sess.groupBy("user_id")
        .agg(F.max("session_idx").alias("n"))
        .collect()
    }
    assert mart  # non-empty
    for uid, row in mart.items():
        assert row.n_sessions == sess_counts[uid]
        assert row.n_sessions >= 1
        assert row.lifetime_cents >= 0
        if row.rfm_segment is not None:
            r_s, f_s, m_s = (
                row.rfm_segment // 100,
                (row.rfm_segment // 10) % 10,
                row.rfm_segment % 10,
            )
            assert 1 <= r_s <= 5 and 1 <= f_s <= 5 and 1 <= m_s <= 5
    # funnel completion agrees with the standalone funnel stage-3 count
    funnel = {
        r.stage_idx: r.n_users
        for r in entry_mod.queries()["funnel_view_click_purchase"](
            spark, sf
        ).collect()
    }
    assert sum(1 for r in mart.values() if r.completed_funnel) == funnel[2]


def test_user_health_mart_single_raw_scan(spark):
    """The composed plan reads the RAW events parquet zero times — every
    branch consumes the materialized base (the corpus_pipeline_e2e
    no-rescan discipline)."""
    sf = "/root/testdata/sf0.001"
    df = entry_mod.queries()["user_health_mart"](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("events.parquet") == 0
    assert "health_base" in plan  # all branches read the materialized base
