"""Watermark-bounded streaming dedup: cross-batch duplicate drop within
the horizon, state-evicted re-admission after it."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.streaming.wm_dedup_stream import (
    stream_dedup_within_watermark,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)


def _write(srcdir, name, rows):
    with open(os.path.join(srcdir, name), "w") as f:
        for eid, payload, ts in rows:
            f.write(
                json.dumps({"event_id": eid, "payload": payload, "ts": ts})
                + "\n"
            )


def _run(spark, src, out, ckpt):
    q = stream_dedup_within_watermark(
        spark, src, SCHEMA, out, ckpt,
        key_cols=("event_id",), watermark_delay="30 minutes",
    )
    q.awaitTermination(180)


def test_cross_batch_dup_dropped_and_readmitted_after_horizon(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch 1: two keys
    _write(src, "b1.json", [
        (1, "first", "2024-01-01 10:00:00"),
        (2, "first", "2024-01-01 10:00:00"),
    ])
    _run(spark, src, out, ckpt)
    # batch 2: key 1 duplicated WITHIN the horizon -> dropped; watermark
    # advances to 10:05 - 30min (still before 10:00 + horizon)
    _write(src, "b2.json", [
        (1, "dup-within", "2024-01-01 10:05:00"),
        (3, "first", "2024-01-01 10:05:00"),
    ])
    _run(spark, src, out, ckpt)
    # batch 3: push the watermark far past key 1's horizon
    _write(src, "b3.json", [(4, "first", "2024-01-01 14:00:00")])
    _run(spark, src, out, ckpt)
    # batch 4: key 1 recurs AFTER the horizon -> state evicted, re-admitted
    _write(src, "b4.json", [(1, "recurrence", "2024-01-01 14:10:00")])
    _run(spark, src, out, ckpt)

    rows = spark.read.parquet(out).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.event_id, []).append(r.payload)
    assert by_key[1] == ["first", "recurrence"] or sorted(
        by_key[1]
    ) == ["first", "recurrence"]
    assert "dup-within" not in by_key[1]
    assert by_key[2] == ["first"] and by_key[3] == ["first"]


def test_same_batch_dups_collapse(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write(src, "b1.json", [
        (7, "a", "2024-01-01 09:00:00"),
        (7, "b", "2024-01-01 09:01:00"),
        (8, "c", "2024-01-01 09:00:30"),
    ])
    _run(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert sorted(r.event_id for r in rows) == [7, 8]
