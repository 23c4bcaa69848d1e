"""Structured Streaming CDC tests: micro-batch incremental merge with
checkpointed resume — batch/stream parity for the A4 fold semantics."""

import json
import os

import pytest
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.streaming import stream_cdc_to_table
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


def _event(op, pos, oid, name):
    row = {"OFFENDER_ID": oid, "LAST_NAME": name}
    out = {
        "table": "T.X",
        "op_type": op,
        "op_ts": "2022-09-07 21:35:18.000000",
        "current_ts": "c",
        "pos": f"{pos:020d}",
    }
    if op in ("U", "D"):
        out["before"] = row
    if op in ("I", "U"):
        out["after"] = row
    return out


def _append_batch(srcdir, name, events):
    with open(os.path.join(srcdir, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _run_once(spark, srcdir, target, ckpt):
    q = stream_cdc_to_table(
        spark, srcdir, ROW_SCHEMA, TARGET_SCHEMA, target,
        pk=["offender_id"], checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)


def test_stream_incremental_merge_across_batches(spark, tmp_path):
    srcdir = os.path.join(str(tmp_path), "src")
    os.makedirs(srcdir)
    target = os.path.join(str(tmp_path), "target")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    _append_batch(srcdir, "b1.json", [
        _event("I", 1, 1, "A"),
        _event("U", 2, 1, "B"),
        _event("I", 3, 2, "C"),
    ])
    _run_once(spark, srcdir, target, ckpt)
    state = {r.offender_id: r.last_name
             for r in spark.read.parquet(target).collect()}
    assert state == {1: "B", 2: "C"}

    # second batch: delete 1, update 2, insert 3 — checkpoint resumes,
    # batch 1 files are NOT reprocessed
    _append_batch(srcdir, "b2.json", [
        _event("D", 4, 1, "B"),
        _event("U", 5, 2, "C2"),
        _event("I", 6, 3, "New"),
    ])
    _run_once(spark, srcdir, target, ckpt)
    state = {r.offender_id: r.last_name
             for r in spark.read.parquet(target).collect()}
    assert state == {2: "C2", 3: "New"}


def test_stream_batch_parity_with_batch_merge(spark, tmp_path):
    """One availableNow pass over all events == batch merge_cdc result."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.cdc import (
        ingest_events, map_events_to_target, merge_cdc)
    from hmpps_digital_prison_reporting_glue_poc_spark.sources import read_cdc_json

    events = [
        _event("I", 1, 1, "A"), _event("U", 2, 1, "B"),
        _event("I", 3, 2, "C"), _event("D", 4, 2, "C"),
        _event("I", 5, 3, "D"),
    ]
    srcdir = os.path.join(str(tmp_path), "src2")
    os.makedirs(srcdir)
    _append_batch(srcdir, "all.json", events)

    target = os.path.join(str(tmp_path), "t2")
    _run_once(spark, srcdir, target, os.path.join(str(tmp_path), "c2"))
    stream_state = {r.offender_id: r.last_name
                    for r in spark.read.parquet(target).collect()}

    raw = read_cdc_json(spark, os.path.join(srcdir, "all.json"), ROW_SCHEMA)
    mapped = map_events_to_target(ingest_events(raw), TARGET_SCHEMA)
    empty = spark.createDataFrame([], schema=TARGET_SCHEMA)
    batch_state = {r.offender_id: r.last_name
                   for r in merge_cdc(empty, mapped, pk=["offender_id"]).collect()}
    assert stream_state == batch_state == {1: "B", 3: "D"}
