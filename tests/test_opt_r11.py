"""Focused tests for the r11 optimization-round internal changes.

1. ``cdc._chain_fold``: groupBy().applyInPandas -> whole-partition
   mapInPandas with carry-over of key groups that span Arrow batches.
   The test forces 2-row Arrow batches so every multi-event key spans a
   boundary, and checks the fold semantics (broken link wedges, D then I
   resurrects as U, reject-D skipped) row for row.
2. ``similarity.power_iteration_top``: Spark-side per-iteration loop ->
   driver-side exact Decimal orbit. A hand-computable diagonal gram pins
   the exact doubles of the 9dp recipe (v1 halves per iteration:
   0.5^8 = 0.00390625) and the floor-decimal eigenvalue.
3. ``behavior.markov_stationary``: per-iteration join tower ->
   driver-side orbit on the collected K^2 edge grid. A symmetric 2-state
   chain stays at the uniform fixpoint exactly; empty input returns an
   empty, correctly-typed frame.
"""

import pytest
from pyspark.sql import functions as F, types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.cdc import merge_cdc
from hmpps_digital_prison_reporting_glue_poc_spark.operators.similarity import (
    power_iteration_top,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    markov_stationary,
)


TARGET_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("admin_gg_pos", T.StringType()),
        T.StructField("admin_hash", T.StringType()),
        T.StructField("previous_hash", T.StringType()),
    ]
)


def _ev(uid, eid, value, etype, pos, h, prev):
    return (uid, eid, value, etype, pos, h, prev)


@pytest.fixture()
def tiny_arrow_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_chain_fold_groups_spanning_arrow_batches(spark, tiny_arrow_batches):
    # key 1: clean 3-event chain -> last event wins (action U)
    # key 2: second link broken -> wedged at event 1 (skipped tail)
    # key 3: I -> D -> I resurrection -> final U with last value
    # key 4: D rejected by hash mismatch -> state stays at event 1
    events = [
        _ev(1, 10, 1.0, "I", "p01", "h10", None),
        _ev(1, 11, 2.0, "U", "p02", "h11", "h10"),
        _ev(1, 12, 3.0, "U", "p03", "h12", "h11"),
        _ev(2, 20, 1.0, "I", "p01", "h20", None),
        _ev(2, 21, 2.0, "U", "p02", "h21", "deadbeef"),
        _ev(2, 22, 3.0, "U", "p03", "h22", "h21"),
        _ev(3, 30, 1.0, "I", "p01", "h30", None),
        _ev(3, 31, 1.5, "D", "p02", "h31", "h30"),
        _ev(3, 32, 9.0, "I", "p03", "h32", "h31"),
        _ev(4, 40, 1.0, "I", "p01", "h40", None),
        _ev(4, 41, 2.0, "D", "p02", "h41", "wrong"),
    ]
    mapped = spark.createDataFrame(events, TARGET_SCHEMA)
    target = spark.createDataFrame([], TARGET_SCHEMA)
    out = merge_cdc(
        target, mapped, pk=["user_id"], validate_hash_chain=True
    ).select("user_id", "event_id", "value")
    got = {r["user_id"]: (r["event_id"], r["value"]) for r in out.collect()}
    assert got == {
        1: (12, 3.0),
        2: (20, 1.0),
        3: (32, 9.0),
        4: (40, 1.0),
    }


def test_chain_fold_base_rows_and_deletes(spark):
    # existing target row consumed by a chained U; a clean D removes key 6
    target = spark.createDataFrame(
        [
            _ev(5, 50, 1.0, "I", "p00", "h50", None),
            _ev(6, 60, 1.0, "I", "p00", "h60", None),
        ],
        TARGET_SCHEMA,
    )
    mapped = spark.createDataFrame(
        [
            _ev(5, 51, 7.0, "U", "p01", "h51", "h50"),
            _ev(6, 61, 0.0, "D", "p01", "h61", "h60"),
        ],
        TARGET_SCHEMA,
    )
    out = merge_cdc(target, mapped, pk=["user_id"], validate_hash_chain=True)
    got = {r["user_id"]: r["event_id"] for r in out.collect()}
    assert got == {5: 51}


def test_power_iteration_driver_orbit_exact(spark):
    # diagonal gram diag(2, 1): component_0 = 1.0 for every iteration,
    # component_1 halves each round -> 0.5^8; eigenvalue floor = 2
    gram_u = spark.createDataFrame(
        [(0, 0, 2), (1, 1, 1)], "i long, j long, s long"
    ).select(
        "i", "j", F.col("s").cast("decimal(38,0)").alias("g")
    )
    rows = {
        r["dim_idx"]: r
        for r in power_iteration_top(gram_u, 2, n_iter=8).collect()
    }
    assert rows[0]["component"] == 1.0
    assert rows[1]["component"] == 0.5 ** 8 == 0.00390625
    assert rows[0]["eigenvalue_q2"] == 2
    assert rows[1]["eigenvalue_q2"] == 2


def test_power_iteration_empty_gram(spark):
    gram_u = spark.createDataFrame([], "i long, j long, g decimal(38,0)")
    rows = power_iteration_top(gram_u, 3, n_iter=2).collect()
    assert [(r["dim_idx"], r["component"], r["eigenvalue_q2"]) for r in rows] == [
        (0, 0.0, None),
        (1, 0.0, None),
        (2, 0.0, None),
    ]


def test_markov_stationary_symmetric_fixpoint(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, "A"),
            (1, 2, "B"),
            (1, 3, "A"),
            (1, 4, "B"),
        ],
        "user_id long, event_id long, event_type string",
    )
    got = {
        r["event_type"]: r["stationary_p"]
        for r in markov_stationary(ev, n_iter=8).collect()
    }
    # A -> B and B -> A with p=1: uniform start is the exact fixpoint
    assert got == {"A": 0.5, "B": 0.5}


def test_markov_stationary_empty(spark):
    ev = spark.createDataFrame(
        [], "user_id long, event_id long, event_type string"
    )
    out = markov_stationary(ev, n_iter=3)
    assert out.columns == ["event_type", "stationary_p"]
    assert out.count() == 0


def test_simhash_pair_shapes_equivalent(spark):
    # size-adaptive candidate generation: the per-chunk broadcast-join
    # loop (bench-scale shape) and the single exploded-chunk self-join
    # (corpus-scale shape) must emit the same pair set
    from hmpps_digital_prison_reporting_glue_poc_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma delta zeta"),
            (4, "totally different words here now"),
            (5, "alpha beta gamma delta epsilon eta"),
        ],
        "doc_id long, text string",
    )
    sketches = dd.simhash(docs, "doc_id", "text", bits=64)
    as_set = lambda df: {  # noqa: E731
        (r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()
    }
    # collect each shape fully before building the next: materialize()
    # allows one live reader per prefix (both calls store the sketch
    # table under simhash_sketches_)
    loop = as_set(
        dd.simhash_near_dup_pairs(
            sketches, "doc_id", max_hamming=3, bits=64, explode_join=False
        )
    )
    exploded = as_set(
        dd.simhash_near_dup_pairs(
            sketches, "doc_id", max_hamming=3, bits=64, explode_join=True
        )
    )
    assert loop == exploded
    assert len(loop) > 0


def test_kcore_early_exit_exact(spark):
    # a triangle plus a pendant vertex: 2-core = the triangle, reached
    # after one peel round; the early exit must return the identical
    # (vertex, degree) rows the full 8 rounds produced
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    got = {
        (r["vertex"], r["degree"])
        for r in kcore_peel(edges, k=2, rounds=8).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 2)}
