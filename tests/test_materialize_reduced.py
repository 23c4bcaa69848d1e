"""Provenance of materialized lineage cuts (r10 advice, fixed r11).

``materialize()`` records at write time — via the logical mirror of the
plan fingerprint's reducer walk — whether the STORED rows crossed a
row-reducer. Only those dirs are exempt from the fingerprint's
FORBIDDEN base-row funnel guards; an input-cardinality cut
(``materialize_if_large`` on a projection / explode, e.g. attr_events_,
bm25_toks_) stays non-exempt, so a single-partition Exchange or
unpartitioned Window fed through its scan still trips
``n_exchange_single_on_base`` / ``n_window_unpartitioned_on_base``.
Before this fix ANY materialized dir passed as "a stored ROLLUP" and a
funnel over a stored full-cardinality frame was invisible.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators import materialize as mz
from hmpps_digital_prison_reporting_glue_poc_spark.plans.fingerprint import (
    plan_fingerprint,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF}/events.parquet")


def _aqe_off(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")


def test_aggregate_output_is_recorded_reduced(spark, events):
    rollup = events.groupBy("event_type").agg(F.count("*").alias("n"))
    out = mz.materialize(rollup, "tred_rollup_")
    path = mz._live["tred_rollup_"]
    assert path in mz._reduced
    assert mz.is_reduced_path(f"Scan parquet [{path}]")
    assert out.count() > 0


def test_projection_output_is_not_reduced(spark, events):
    proj = events.select("event_id", "user_id")
    mz.materialize(proj, "tred_proj_")
    path = mz._live["tred_proj_"]
    assert path not in mz._reduced


def test_chained_cut_keeps_provenance(spark, events):
    """A projection OVER a stored rollup is still rollup-bounded: the
    leaf of its producing plan is a reduced dir, so the chained dir is
    recorded reduced too."""
    rollup = mz.materialize(
        events.groupBy("event_type").agg(F.count("*").alias("n")),
        "tred_chain_a_",
    )
    mz.materialize(
        rollup.select("event_type", (F.col("n") * 2).alias("n2")),
        "tred_chain_b_",
    )
    assert mz._live["tred_chain_b_"] in mz._reduced


def test_funnel_over_reduced_dir_is_exempt(spark, events):
    """An unpartitioned Window over a stored ROLLUP is a bounded-rollup
    window — not a base-row funnel."""
    _aqe_off(spark)
    try:
        rollup = mz.materialize(
            events.groupBy("event_type").agg(F.count("*").alias("n")),
            "tred_ok_",
        )
        w = Window.orderBy("event_type")
        fp = plan_fingerprint(
            rollup.select("event_type", F.row_number().over(w).alias("r"))
        )
        assert fp["n_window_unpartitioned"] >= 1
        assert fp["n_window_unpartitioned_on_base"] == 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_funnel_over_unreduced_dir_trips_the_guard(spark, events):
    """THE r10-advice hazard: an unpartitioned Window fed
    input-cardinality rows through a materialized projection must still
    count as a base-row funnel."""
    _aqe_off(spark)
    try:
        proj = mz.materialize(
            events.select("event_id", "user_id"), "tred_bad_"
        )
        w = Window.orderBy("event_id")
        fp = plan_fingerprint(
            proj.select("event_id", F.row_number().over(w).alias("r"))
        )
        assert fp["n_window_unpartitioned_on_base"] >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_reap_clears_reduced_registry(spark, events):
    rollup = events.groupBy("event_type").agg(F.count("*").alias("n"))
    mz.materialize(rollup, "tred_reap_")
    first = mz._live["tred_reap_"]
    assert first in mz._reduced
    mz.materialize(rollup, "tred_reap_")
    assert first not in mz._reduced  # old dir's record reaped with it
    assert mz._live["tred_reap_"] in mz._reduced
