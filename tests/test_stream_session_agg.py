"""Native session_window streaming: gap-merge across micro-batches,
exactly-once append emission, and batch/stream parity."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.streaming.session_agg import (
    stream_session_aggregates,
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(srcdir, name, rows):
    with open(os.path.join(srcdir, name), "w") as f:
        for event_id, user, ts, value in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": event_id,
                        "user_id": user,
                        "ts": ts,
                        "value": value,
                    }
                )
                + "\n"
            )


def _run(spark, srcdir, outdir, ckpt):
    stream = (
        spark.readStream.schema(SRC_SCHEMA)
        .json(srcdir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_session_aggregates(stream, "30 minutes", "30 minutes")
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_session_merges_across_batches_and_emits_once(spark, tmp_path):
    srcdir = os.path.join(str(tmp_path), "src")
    outdir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    # batch 1: two events 20 min apart (one session so far)
    _write(srcdir, "b1.json", [
        (1, "u", "2024-01-01 10:00:00", 1.0),
        (2, "u", "2024-01-01 10:20:00", 2.0),
    ])
    _run(spark, srcdir, outdir, ckpt)
    # nothing final yet (watermark hasn't passed session end)
    assert spark.read.schema(
        "user_id string, session_start timestamp, session_end timestamp,"
        " n_events long, cents long"
    ).parquet(outdir).count() == 0

    # batch 2: an in-gap continuation (10:45, 25 min after 10:20 -> SAME
    # session, proving cross-batch merge) plus a far-future event that
    # pushes the watermark beyond the merged session's end
    _write(srcdir, "b2.json", [
        (3, "u", "2024-01-01 10:45:00", 4.0),
        (4, "w", "2024-01-01 15:00:00", 0.0),
    ])
    _run(spark, srcdir, outdir, ckpt)

    rows = spark.read.parquet(outdir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == "u"
    assert str(r.session_start) == "2024-01-01 10:00:00"
    assert str(r.session_end) == "2024-01-01 11:15:00"  # 10:45 + 30 min
    assert r.n_events == 3
    assert r.cents == 700

    # batch 3: advance watermark far enough to flush w's session too;
    # u's session must NOT re-emit (append = exactly once)
    _write(srcdir, "b3.json", [(5, "x", "2024-01-01 20:00:00", 0.0)])
    _run(spark, srcdir, outdir, ckpt)
    final = spark.read.parquet(outdir).collect()
    assert sum(1 for r in final if r.user_id == "u") == 1
    assert sum(1 for r in final if r.user_id == "w") == 1


def test_stream_batch_parity_on_closed_sessions(spark, tmp_path):
    """The streamed session table equals the batch session_window rollup
    for every session the watermark closed."""
    srcdir = os.path.join(str(tmp_path), "src")
    outdir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    rows1 = [
        (1, "a", "2024-01-01 09:00:00", 1.0),
        (2, "a", "2024-01-01 09:10:00", 2.0),
        (3, "b", "2024-01-01 09:05:00", 5.0),
    ]
    rows2 = [
        (4, "a", "2024-01-01 11:00:00", 3.0),   # new session for a
        (5, "b", "2024-01-01 09:20:00", 7.0),   # continues b's session
        (6, "z", "2024-01-02 00:00:00", 0.0),   # watermark pusher
    ]
    _write(srcdir, "b1.json", rows1)
    _run(spark, srcdir, outdir, ckpt)
    _write(srcdir, "b2.json", rows2)
    _run(spark, srcdir, outdir, ckpt)
    _write(srcdir, "b3.json", [(7, "z", "2024-01-03 00:00:00", 0.0)])
    _run(spark, srcdir, outdir, ckpt)

    batch = (
        spark.createDataFrame(
            [r for r in rows1 + rows2 + [(7, "z", "2024-01-03 00:00:00", 0.0)]],
            "event_id long, user_id string, ts string, value double",
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.round(F.col("value").cast("double") * 100, 0).cast("long")
            )
            .cast("long")
            .alias("cents"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "cents",
        )
    )
    streamed = spark.read.parquet(outdir)
    b = {
        (r.user_id, str(r.session_start)): (r.n_events, r.cents)
        for r in batch.collect()
        if r.user_id != "z"  # z's last session never closes
    }
    s = {
        (r.user_id, str(r.session_start)): (r.n_events, r.cents)
        for r in streamed.collect()
        if r.user_id != "z"
    }
    assert s == b
