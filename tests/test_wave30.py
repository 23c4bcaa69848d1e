"""Wave-30 operators: co-purchase lift, time-bounded funnels, streaming
KS drift (batch/stream parity)."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    copurchase_lift,
    funnel_time_bound,
    ks_two_sample,
)


def test_copurchase_lift_exact(spark):
    # users: u1{A,B}, u2{A,B}, u3{A,C}, u4{B}  -> n_users=4
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "B"),
        (1, "A"),  # duplicate holding must not double-count
    ]
    df = spark.createDataFrame(rows, "user_id long, item string")
    got = {
        (r.item_a, r.item_b): (r.n_both, r.lift)
        for r in copurchase_lift(df, "user_id", "item", min_pairs=1).collect()
    }
    # margins: A=3, B=3, C=1; pairs: (A,B)=2, (A,C)=1
    assert got[("A", "B")] == (2, pytest.approx(2 * 4 / (3 * 3)))
    assert got[("A", "C")] == (1, pytest.approx(1 * 4 / (3 * 1)))
    assert ("B", "C") not in got


def test_copurchase_min_pairs_filter(spark):
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C")]
    df = spark.createDataFrame(rows, "user_id long, item string")
    got = {(r.item_a, r.item_b)
           for r in copurchase_lift(df, "user_id", "item", min_pairs=2).collect()}
    assert got == {("A", "B")}


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s))
         for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_time_bound_vs_unbounded(spark):
    rows = [
        # u1: full funnel inside the window
        (1, "view", 0), (1, "click", 100), (1, "purchase", 200),
        # u2: click arrives AFTER the 1h gap -> only stage 0 counts
        (2, "view", 0), (2, "click", 5000), (2, "purchase", 5100),
        # u3: click in window, purchase outside it
        (3, "view", 0), (3, "click", 100), (3, "purchase", 4000),
    ]
    out = {r.stage: r.n_users for r in funnel_time_bound(
        _ev(spark, rows), ["view", "click", "purchase"],
        max_gap_seconds=3600,
    ).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_time_bound_boundary_inclusive(spark):
    rows = [(1, "view", 0), (1, "click", 3600)]
    out = {r.stage: r.n_users for r in funnel_time_bound(
        _ev(spark, rows), ["view", "click"], max_gap_seconds=3600
    ).collect()}
    assert out == {"view": 1, "click": 1}  # exactly at the bound counts


def test_stream_ks_matches_batch(spark, tmp_path):
    from pyspark.sql import types as T

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        ks_from_state,
        stream_ks_drift,
    )

    schema = T.StructType([
        T.StructField("value", T.DoubleType()),
        T.StructField("is_right", T.BooleanType()),
    ])
    left = [1.0, 1.5, 2.0, 2.0, 3.25, 4.0]
    right = [2.0, 3.0, 3.25, 5.0, 6.5]
    rows = [(v, False) for v in left] + [(v, True) for v in right]

    src = tmp_path / "src"
    src.mkdir()
    # two files -> the state merges across micro-batches
    for i, chunk in enumerate((rows[:5], rows[5:])):
        with open(src / f"b{i}.json", "w") as f:
            for v, r in chunk:
                f.write(json.dumps({"value": v, "is_right": r}) + "\n")

    state = str(tmp_path / "state")
    q = stream_ks_drift(
        spark, str(src), schema, state, str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination()

    batch = ks_two_sample(
        spark.createDataFrame(rows, "value double, is_right boolean"),
        "is_right", "value",
    ).collect()[0]
    streamed = ks_from_state(spark, state).collect()[0]
    assert streamed.n_left == batch.n_left
    assert streamed.n_right == batch.n_right
    assert streamed.ks_d == batch.ks_d
    assert streamed.ks_at_value == batch.ks_at_value


def test_stream_ks_replay_is_idempotent(spark, tmp_path):
    """Re-running the drain with a FRESH checkpoint over the same files
    (a full replay) must leave the state identical — batch-id-keyed
    dynamic overwrite, not append."""
    from pyspark.sql import types as T

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        ks_from_state,
        stream_ks_drift,
    )

    schema = T.StructType([
        T.StructField("value", T.DoubleType()),
        T.StructField("is_right", T.BooleanType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for v, r in [(1.0, False), (2.0, True), (3.0, True)]:
            f.write(json.dumps({"value": v, "is_right": r}) + "\n")

    state = str(tmp_path / "state")
    for ck in ("ck1", "ck2"):  # second run = full replay
        q = stream_ks_drift(
            spark, str(src), schema, state, str(tmp_path / ck),
            trigger_once=True,
        )
        q.awaitTermination()
    out = ks_from_state(spark, state).collect()[0]
    assert out.n_left == 1 and out.n_right == 2


def test_stream_ks_fresh_checkpoint_repacked_batches(spark, tmp_path):
    """ADVICE r5: a fresh-checkpoint rerun may pack the same files into
    FEWER batches than the original run. The original run left state
    partitions __batch_id=0 and =1; the rerun sees everything as batch 0
    and must sweep the stale __batch_id=1 partition instead of letting
    it double-count."""
    from pyspark.sql import types as T

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        ks_from_state,
        stream_ks_drift,
    )

    schema = T.StructType([
        T.StructField("value", T.DoubleType()),
        T.StructField("is_right", T.BooleanType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for v, r in [(1.0, False), (2.0, True)]:
            f.write(json.dumps({"value": v, "is_right": r}) + "\n")

    state = str(tmp_path / "state")
    # run 1, batch 0: file b0 only
    q = stream_ks_drift(
        spark, str(src), schema, state, str(tmp_path / "ck1"),
        trigger_once=True,
    )
    q.awaitTermination()
    # run 1 continued, batch 1: file b1 arrives, same checkpoint
    with open(src / "b1.json", "w") as f:
        for v, r in [(3.0, False), (4.0, True)]:
            f.write(json.dumps({"value": v, "is_right": r}) + "\n")
    q = stream_ks_drift(
        spark, str(src), schema, state, str(tmp_path / "ck1"),
        trigger_once=True,
    )
    q.awaitTermination()
    import os
    assert os.path.isdir(os.path.join(state, "__batch_id=1"))

    # run 2: FRESH checkpoint — both files repack into a single batch 0
    q = stream_ks_drift(
        spark, str(src), schema, state, str(tmp_path / "ck2"),
        trigger_once=True,
    )
    q.awaitTermination()
    assert not os.path.isdir(os.path.join(state, "__batch_id=1"))
    out = ks_from_state(spark, state).collect()[0]
    assert out.n_left == 2 and out.n_right == 2


def test_copurchase_max_basket_drops_bot_user(spark):
    """r5 verdict finding 2: a planted bot user holding many items must be
    pruned BEFORE the self-join, with margins and n_users computed over
    the pruned holdings (internal consistency, the max_df convention)."""
    normal = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C")]
    bot = [(99, f"i{k}") for k in range(50)] + [(99, "A"), (99, "B")]
    df = spark.createDataFrame(
        normal + bot, "user_id long, item string"
    )
    got = {
        (r.item_a, r.item_b): (r.n_both, r.lift)
        for r in copurchase_lift(
            df, "user_id", "item", min_pairs=1, max_basket=10
        ).collect()
    }
    # bot (basket 52 > 10) fully dropped: n_users=3, margins A=3,B=2,C=1
    assert got[("A", "B")] == (2, pytest.approx(2 * 3 / (3 * 2)))
    assert not any("i0" in p for pair in got for p in pair)
    # cap non-binding when every basket fits
    unchanged = {
        (r.item_a, r.item_b): (r.n_both, r.lift)
        for r in copurchase_lift(
            spark.createDataFrame(normal, "user_id long, item string"),
            "user_id", "item", min_pairs=1, max_basket=10,
        ).collect()
    }
    baseline = {
        (r.item_a, r.item_b): (r.n_both, r.lift)
        for r in copurchase_lift(
            spark.createDataFrame(normal, "user_id long, item string"),
            "user_id", "item", min_pairs=1,
        ).collect()
    }
    assert unchanged == baseline


def test_stream_ks_accumulates_across_separate_runs(spark, tmp_path):
    """Round-6 stress catch: foreachBatch hands over a CLONED session, so
    dynamic partition overwrite must be a WRITER option — with the old
    session-conf approach every batch full-overwrote the state dir and
    destroyed all prior deltas. Two genuinely separate micro-batches
    (separate availableNow runs, same checkpoint) must both persist."""
    from pyspark.sql import types as T

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        ks_from_state,
        stream_ks_drift,
    )

    schema = T.StructType([
        T.StructField("value", T.DoubleType()),
        T.StructField("is_right", T.BooleanType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ck")

    with open(src / "b0.json", "w") as f:
        f.write(json.dumps({"value": 1.0, "is_right": False}) + "\n")
    q = stream_ks_drift(spark, str(src), schema, state, ckpt,
                        trigger_once=True)
    q.awaitTermination()
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"value": 2.0, "is_right": True}) + "\n")
    q = stream_ks_drift(spark, str(src), schema, state, ckpt,
                        trigger_once=True)
    q.awaitTermination()

    import os
    parts = {p for p in os.listdir(state) if p.startswith("__batch_id=")}
    assert parts == {"__batch_id=0", "__batch_id=1"}
    out = ks_from_state(spark, state).collect()[0]
    assert out.n_left == 1 and out.n_right == 1


def test_materialize_if_large_gates_on_estimated_size(spark):
    """The lineage cut runs only above the size threshold: below it the
    returned frame is the SAME logical plan (no temp-parquet read); above
    it the frame reads from storage (r7 copurchase A/B, SCALE.md)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import (
        estimated_bytes,
        materialize_if_large,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    est = estimated_bytes(df)
    assert est > 0

    inline = materialize_if_large(df, "gate_test_", min_bytes=est + 1_000_000)
    assert "Scan parquet" not in inline._jdf.queryExecution().executedPlan().toString()
    assert inline.collect() == df.collect()

    cut = materialize_if_large(df, "gate_test_", min_bytes=0)
    assert "Parquet" in cut._jdf.queryExecution().executedPlan().toString()
    assert sorted(map(tuple, cut.collect())) == sorted(map(tuple, df.collect()))
