"""Streaming Page-Hinkley monitor: batch/stream parity (the merged
per-day cents state must reproduce the batch operator bit-for-bit),
late/out-of-order day arrivals, and compaction-bounded state."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import page_hinkley
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.pagehinkley_stream import (
    ph_from_state,
    stream_page_hinkley,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(b: int) -> list[dict]:
    """Purchases spread over days 1..8 with a level shift from batch 3
    on; batch 2 is empty; every batch also re-touches EARLIER days
    (late/out-of-order arrivals the mergeable grid must absorb)."""
    if b == 2:
        return []
    out = []
    for i in range(12):
        day = (b * 2 + i) % 8 + 1
        val = 1.0 + (0.5 if b >= 3 else 0.0) + (i % 3) * 0.25
        out.append(
            {
                "ts": f"2025-02-{day:02d}T10:0{i % 6}:00",
                "event_type": "purchase" if i % 4 != 3 else "click",
                "value": val,
            }
        )
    return out


def _parts(path: str) -> list[int]:
    return [
        int(p.split("=", 1)[1])
        for p in os.listdir(path)
        if p.startswith("__batch_id=")
    ]


def _write(src: str, b: int, rows: list[dict]) -> None:
    with open(os.path.join(src, f"b{b}.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_stream_matches_batch_operator(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    all_rows: list[dict] = []
    for b in range(6):
        rows = _rows(b)
        all_rows.extend(rows)
        _write(src, b, rows)
        q = stream_page_hinkley(
            spark, src, SCHEMA, state, ck, compact_threshold=3
        )
        q.awaitTermination()
        got = sorted(map(repr, ph_from_state(spark, state).collect()))
        batch_events = spark.createDataFrame(
            [(r["ts"].replace("T", " "), r["event_type"], r["value"]) for r in all_rows],
            "ts string, event_type string, value double",
        ).select(
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )
        daily = (
            batch_events.filter(F.col("event_type") == "purchase")
            .select(
                F.to_date("ts").alias("day"),
                F.round(F.col("value").cast("double") * 100, 0)
                .cast("long")
                .alias("__cents"),
            )
            .groupBy("day")
            .agg(F.sum("__cents").cast("long").alias("x"))
        )
        want = sorted(map(repr, page_hinkley(daily, "day", "x").collect()))
        assert got == want, f"batch {b}: stream state diverged from batch"
    # compaction bounded the partition count (threshold 3, 6 batches)
    assert len(_parts(state)) < 6
    assert min(_parts(state)) < 0  # a base partition exists


def test_shift_is_visible_in_stream_state(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    for b in range(6):
        _write(src, b, _rows(b))
    q = stream_page_hinkley(spark, src, SCHEMA, state, ck)
    q.awaitTermination()
    rows = {r.day.day: r for r in ph_from_state(spark, state).collect()}
    assert len(rows) == 8
    # the post-shift days carry the peak; PH is nonneg everywhere
    assert all(r.ph_micros >= 0 for r in rows.values())
    assert any(r.is_peak for r in rows.values())
    assert max(r.ph_micros for r in rows.values()) > 0


def test_same_checkpoint_rerun_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    _write(src, 0, _rows(0))
    for _ in range(2):  # second run sees no new files -> no state change
        q = stream_page_hinkley(spark, src, SCHEMA, state, ck)
        q.awaitTermination()
    rows = ph_from_state(spark, state).collect()
    purchase_days = {
        r["ts"][8:10] for r in _rows(0) if r["event_type"] == "purchase"
    }
    assert len(rows) == len(purchase_days)
