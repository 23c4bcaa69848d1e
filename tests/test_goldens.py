"""Golden-value and idempotence tests.

The reference pins Murmur3 struct-hash golden values
(reference tests/test_1_gg_logs_to_parquet.py:23-34) because the
change-detection fingerprint must be stable across releases — same
discipline here on our own fixture rows. Plus: merge idempotence (the
driver re-runs rounds; applying the same batch twice must be a no-op)."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.cdc import (
    ingest_events,
    map_events_to_target,
    merge_cdc,
)
from hmpps_digital_prison_reporting_glue_poc_spark.sources import read_cdc_json
from hmpps_digital_prison_reporting_glue_poc_spark.types import (
    schema_from_ddl,
    with_admin_columns,
)

ROW_SCHEMA = T.StructType(
    [
        T.StructField("OFFENDER_ID", T.LongType()),
        T.StructField("LAST_NAME", T.StringType()),
    ]
)
TARGET_SCHEMA = with_admin_columns(
    schema_from_ddl("offender_id bigint, last_name varchar2(40)")
)


def _write(tmp_path, events, name="e.json"):
    path = os.path.join(str(tmp_path), name)
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    return path


def test_struct_hash_golden_values(spark):
    """Murmur3 over a struct is deterministic and pinned: a change to the
    hash input (field order, types, seed) must fail this test."""
    df = spark.createDataFrame(
        [((1, "Smith"),), ((2, "Jones"),)],
        T.StructType([T.StructField("after", ROW_SCHEMA)]),
    ).withColumn("after_hash", F.hash(F.col("after")))
    got = {r.after.OFFENDER_ID: r.after_hash for r in df.collect()}
    # golden values computed once from Spark's Murmur3 (seed 42) — stable
    # across sessions and releases by contract
    assert got == {1: 1474477848, 2: 1587839816}


def test_hash_insensitive_to_run(spark):
    """Same payload hashed twice in different frames -> same fingerprint."""
    make = lambda: spark.createDataFrame(
        [((7, "Same"),)], T.StructType([T.StructField("after", ROW_SCHEMA)])
    ).select(F.hash("after").alias("h"))
    assert make().first().h == make().first().h


def test_merge_is_idempotent(spark, tmp_path):
    events = [
        {"table": "S.T", "op_type": "I", "op_ts": "2022-09-07 10:00:00.000000",
         "current_ts": "c", "pos": f"{1:020d}",
         "after": {"OFFENDER_ID": 1, "LAST_NAME": "A"}},
        {"table": "S.T", "op_type": "U", "op_ts": "2022-09-07 11:00:00.000000",
         "current_ts": "c", "pos": f"{2:020d}",
         "before": {"OFFENDER_ID": 1, "LAST_NAME": "A"},
         "after": {"OFFENDER_ID": 1, "LAST_NAME": "B"}},
        {"table": "S.T", "op_type": "D", "op_ts": "2022-09-07 12:00:00.000000",
         "current_ts": "c", "pos": f"{3:020d}",
         "before": {"OFFENDER_ID": 2, "LAST_NAME": "X"}},
    ]
    path = _write(tmp_path, events)
    raw = read_cdc_json(spark, path, ROW_SCHEMA)
    mapped = map_events_to_target(ingest_events(raw), TARGET_SCHEMA)

    empty = spark.createDataFrame([], TARGET_SCHEMA)
    once = merge_cdc(empty, mapped, pk=["offender_id"])
    twice = merge_cdc(once, mapped, pk=["offender_id"])
    a = sorted((r.offender_id, r.last_name) for r in once.collect())
    b = sorted((r.offender_id, r.last_name) for r in twice.collect())
    assert a == b == [(1, "B")]


def test_merge_empty_batch_is_noop(spark, tmp_path):
    path = _write(tmp_path, [
        {"table": "S.T", "op_type": "I", "op_ts": "2022-09-07 10:00:00.000000",
         "current_ts": "c", "pos": f"{1:020d}",
         "after": {"OFFENDER_ID": 5, "LAST_NAME": "Z"}},
    ])
    raw = read_cdc_json(spark, path, ROW_SCHEMA)
    mapped = map_events_to_target(ingest_events(raw), TARGET_SCHEMA)
    target = merge_cdc(
        spark.createDataFrame([], TARGET_SCHEMA), mapped, pk=["offender_id"]
    )
    empty_batch = mapped.filter(F.lit(False))
    after = merge_cdc(target, empty_batch, pk=["offender_id"])
    assert sorted(r.offender_id for r in after.collect()) == [5]
