"""Watermark semantics: append-mode windows finalize once the watermark
passes; events later than the watermark delay are dropped, not double
counted."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.streaming.windowed import (
    stream_windowed_counts,
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(srcdir, name, rows):
    with open(os.path.join(srcdir, name), "w") as f:
        for event_id, ts, value in rows:
            f.write(json.dumps({"event_id": event_id, "ts": ts, "value": value}) + "\n")


def _run(spark, srcdir, outdir, ckpt):
    stream = (
        spark.readStream.schema(SRC_SCHEMA)
        .json(srcdir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_windowed_counts(stream, "10 minutes", "30 minutes")
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_watermark_finalizes_windows_and_drops_late_events(spark, tmp_path):
    srcdir = os.path.join(str(tmp_path), "src")
    outdir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    # batch 1: three events in window [10:00, 10:10) and one at 11:30 that
    # pushes the watermark to 11:00 at the batch boundary
    _write(srcdir, "b1.json", [
        (1, "2024-01-01 10:01:00", 1.0),
        (2, "2024-01-01 10:02:00", 2.0),
        (3, "2024-01-01 10:09:00", 3.0),
        (4, "2024-01-01 11:30:00", 4.0),
    ])
    _run(spark, srcdir, outdir, ckpt)

    # batch 2: a LATE event for the already-finalized 10:00 window (beyond
    # the 30-min watermark) plus a fresh event far ahead that finalizes
    # everything else
    _write(srcdir, "b2.json", [
        (5, "2024-01-01 10:03:00", 100.0),   # late -> dropped
        (6, "2024-01-01 15:00:00", 5.0),
    ])
    _run(spark, srcdir, outdir, ckpt)
    # one more tick so the last watermark advance flushes window 11:30
    _write(srcdir, "b3.json", [(7, "2024-01-01 18:00:00", 6.0)])
    _run(spark, srcdir, outdir, ckpt)

    rows = {
        str(r.window_start): (r.n_events, r.sum_value)
        for r in spark.read.parquet(outdir).collect()
    }
    # the 10:00 window emitted exactly once, WITHOUT the late event 5
    assert rows["2024-01-01 10:00:00"] == (3, 6.0)
    assert rows["2024-01-01 11:30:00"] == (1, 4.0)
    assert rows["2024-01-01 15:00:00"] == (1, 5.0)
