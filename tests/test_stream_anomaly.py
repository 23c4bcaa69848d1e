"""Streaming daily-anomaly monitor: batch/stream parity over multiple
micro-batches, incremental updates, compaction-bounded state, and
idempotent same-checkpoint re-run."""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    daily_anomaly_robust_z,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.anomaly_stream import (
    anomaly_from_state,
    stream_daily_anomaly,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)

_BASE = datetime.datetime(2024, 1, 1, 9)


def _write_batch(src: str, name: str, rows):
    with open(os.path.join(src, name), "w") as fh:
        for (i, day, typ) in rows:
            ts = (_BASE + datetime.timedelta(days=day)).isoformat()
            fh.write(
                json.dumps({"event_id": i, "ts": ts, "event_type": typ}) + "\n"
            )


def test_stream_matches_batch_and_updates(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    all_rows = []
    eid = 0
    # day counts across batches: day0: 3, day1: 6, day2: 2, day3: 9 — plus
    # non-purchase noise that must be filtered out
    plan = [
        [(0, 2), (1, 3)],
        [(1, 3), (2, 2), (0, 1)],
        [(3, 9)],
    ]
    for b, spec in enumerate(plan):
        rows = []
        for day, n in spec:
            for _ in range(n):
                rows.append((eid, day, "purchase"))
                eid += 1
            rows.append((eid, day, "view"))
            eid += 1
        all_rows += rows
        _write_batch(src, f"b{b}.json", rows)
        q = stream_daily_anomaly(
            spark, src, SCHEMA, state, ck,
            trigger_once=True, compact_threshold=2,
        )
        q.awaitTermination()
        # after every batch the state answers with CURRENT scores
        got = {
            r.day.isoformat(): (r.n_events, r.robust_z)
            for r in anomaly_from_state(spark, state).collect()
        }
        batch_df = spark.createDataFrame(
            [
                (i, _BASE + datetime.timedelta(days=d), t, 1.0)
                for (i, d, t) in all_rows
            ],
            "event_id long, ts timestamp, event_type string, value double",
        )
        expect = {
            r.day.isoformat(): (r.n_events, r.robust_z)
            for r in daily_anomaly_robust_z(batch_df).collect()
        }
        assert got == expect, f"batch {b}"
    assert {d: c for d, (c, _) in got.items()} == {
        "2024-01-01": 3, "2024-01-02": 6, "2024-01-03": 2, "2024-01-04": 9,
    }


def test_stream_rerun_same_checkpoint_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    _write_batch(src, "b0.json", [(i, i % 3, "purchase") for i in range(12)])
    for _ in range(2):  # second run sees no new files — state unchanged
        q = stream_daily_anomaly(
            spark, src, SCHEMA, state, ck, trigger_once=True
        )
        q.awaitTermination()
        got = {
            r.day.isoformat(): r.n_events
            for r in anomaly_from_state(spark, state).collect()
        }
        assert got == {
            "2024-01-01": 4, "2024-01-02": 4, "2024-01-03": 4,
        }
