"""Streaming funnel CEP: cross-batch stage progression, strict ordering,
window expiry, repeat conversions, and a Python-fold differential."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.streaming.funnel_stream import (
    stream_funnel_completions,
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)

STAGES = ["view", "click", "purchase"]


def _write(srcdir, name, rows):
    with open(os.path.join(srcdir, name), "w") as f:
        for eid, user, etype, ts in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "user_id": user,
                        "event_type": etype,
                        "ts": ts,
                    }
                )
                + "\n"
            )


def _run(spark, srcdir, outdir, ckpt, window_hours=72.0):
    stream = (
        spark.readStream.schema(SRC_SCHEMA)
        .json(srcdir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_funnel_completions(stream, STAGES, window_hours=window_hours)
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _fold(rows, window_hours=72.0):
    """Reference Python fold with identical semantics."""
    window_us = int(window_hours * 3_600_000_000)
    import datetime

    state = {}
    out = []
    for eid, user, etype, ts in sorted(rows):
        us = int(
            datetime.datetime.fromisoformat(ts).timestamp() * 1_000_000
        )
        stage, anchor, prev, done = state.get(user, (0, 0, 0, 0))
        if stage > 0 and us - anchor > window_us:
            stage, anchor, prev = 0, 0, 0
        if etype == STAGES[stage] and (stage == 0 or us > prev):
            if stage == 0:
                anchor = us
            prev = us
            stage += 1
            if stage == len(STAGES):
                done += 1
                out.append((user, done, anchor, us))
                stage, anchor, prev = 0, 0, 0
        state[user] = (stage, anchor, prev, done)
    return out


def test_funnel_cross_batch_completion_and_repeat(spark, tmp_path):
    srcdir = os.path.join(str(tmp_path), "src")
    outdir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    # batch 1: user 1 reaches stage 2 (view, click); user 2 goes straight
    # to purchase (no progress — wrong first stage)
    _write(srcdir, "b1.json", [
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:05:00"),
        (3, 2, "purchase", "2024-01-01 10:00:00"),
    ])
    _run(spark, srcdir, outdir, ckpt)
    assert (
        spark.read.schema(
            "user_id long, funnel_idx long, started_us long,"
            " completed_us long, duration_us long"
        )
        .parquet(outdir)
        .count()
        == 0
    )

    # batch 2: user 1 purchases (completes ACROSS the batch boundary),
    # then runs a full second funnel
    _write(srcdir, "b2.json", [
        (4, 1, "purchase", "2024-01-01 10:30:00"),
        (5, 1, "view", "2024-01-01 11:00:00"),
        (6, 1, "click", "2024-01-01 11:10:00"),
        (7, 1, "purchase", "2024-01-01 11:20:00"),
    ])
    _run(spark, srcdir, outdir, ckpt)
    rows = sorted(
        spark.read.parquet(outdir).collect(), key=lambda r: r.funnel_idx
    )
    assert [(r.user_id, r.funnel_idx) for r in rows] == [(1, 1), (1, 2)]
    assert rows[0].duration_us == 30 * 60 * 1_000_000
    assert rows[1].duration_us == 20 * 60 * 1_000_000


def test_funnel_window_expiry_resets_progress(spark, tmp_path):
    srcdir = os.path.join(str(tmp_path), "src")
    outdir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    # stage 0+1 at 10:00, final stage 3h later with a 1h window: the
    # in-flight funnel is abandoned — no completion
    _write(srcdir, "b1.json", [
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:10:00"),
        (3, 1, "purchase", "2024-01-01 13:30:00"),
    ])
    _run(spark, srcdir, outdir, ckpt, window_hours=1.0)
    assert (
        spark.read.schema(
            "user_id long, funnel_idx long, started_us long,"
            " completed_us long, duration_us long"
        )
        .parquet(outdir)
        .count()
        == 0
    )


def test_funnel_differential_vs_python_fold(spark, tmp_path):
    srcdir = os.path.join(str(tmp_path), "src")
    outdir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    import datetime
    import random

    rng = random.Random(7)
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = []
    eid = 0
    for user in range(1, 6):
        t = 0
        for _ in range(40):
            eid += 1
            t += rng.randint(1, 90)
            etype = rng.choice(["view", "click", "purchase", "error"])
            ts = (base + datetime.timedelta(minutes=t)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            rows.append((eid, user, etype, ts))
    rows.sort()
    # split into 4 batches by event id (ordered delivery)
    per = len(rows) // 4
    for b in range(4):
        chunk = rows[b * per : (b + 1) * per if b < 3 else len(rows)]
        _write(srcdir, f"b{b}.json", chunk)
        _run(spark, srcdir, outdir, ckpt)

    got = sorted(
        (r.user_id, r.funnel_idx, r.started_us, r.completed_us)
        for r in spark.read.parquet(outdir).collect()
    )
    want = sorted(_fold(rows))
    assert got == want
    assert len(got) > 0  # the corpus actually converts somewhere
