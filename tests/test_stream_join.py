"""Stream-stream event-time-bounded join: matches inside the lookback
window pair up (including across micro-batches); matches outside it never
emit."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.streaming.join_stream import (
    stream_enrich,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)


def _write(srcdir, name, rows):
    with open(os.path.join(srcdir, name), "w") as f:
        for event_id, user_id, kind, ts in rows:
            f.write(
                json.dumps(
                    {"event_id": event_id, "user_id": user_id, "kind": kind, "ts": ts}
                )
                + "\n"
            )


def _run(spark, srcdir, outdir, ckpt):
    def src():
        return (
            spark.readStream.schema(SCHEMA)
            .json(srcdir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    purchases = src().filter(F.col("kind") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = src().filter(F.col("kind") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("r_ts"),
    )
    q = (
        stream_enrich(purchases, views, watermark_delay="30 minutes", lookback="1 hour")
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_stream_join_bounded_lookback(spark, tmp_path):
    srcdir = os.path.join(str(tmp_path), "src")
    outdir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    # batch 1: a view, then a purchase 10 min later (in-window match);
    # another user's view 3 hours before their purchase (out of window)
    _write(srcdir, "b1.json", [
        (1, 100, "view", "2024-01-01 10:00:00"),
        (2, 100, "purchase", "2024-01-01 10:10:00"),
        (3, 200, "view", "2024-01-01 07:00:00"),
        (4, 200, "purchase", "2024-01-01 10:00:00"),
    ])
    _run(spark, srcdir, outdir, ckpt)

    # batch 2: purchase arriving later whose matching view came in batch 1
    # (cross-batch join through buffered state)
    _write(srcdir, "b2.json", [
        (5, 100, "purchase", "2024-01-01 10:20:00"),
        (6, 300, "view", "2024-01-01 11:00:00"),
        (7, 300, "purchase", "2024-01-01 11:30:00"),
    ])
    _run(spark, srcdir, outdir, ckpt)

    pairs = {
        (r.purchase_id, r.view_id)
        for r in spark.read.parquet(outdir).collect()
    }
    assert (2, 1) in pairs, "in-window same-batch match"
    assert (5, 1) in pairs, "cross-batch match via buffered state"
    assert (7, 6) in pairs
    assert not any(p == 4 for p, _ in pairs), "3h-old view must not match"


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream rows pick up dimension attributes; unmatched keys survive
    with NULLs (left join)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.join_stream import (
        stream_enrich_static,
    )

    srcdir = os.path.join(str(tmp_path), "src2")
    outdir = os.path.join(str(tmp_path), "out2")
    ckpt = os.path.join(str(tmp_path), "ckpt2")
    os.makedirs(srcdir)
    _write(srcdir, "b1.json", [
        (1, 100, "purchase", "2024-01-01 10:00:00"),
        (2, 999, "purchase", "2024-01-01 10:05:00"),  # no dim row
    ])
    dim = spark.createDataFrame(
        [(100, "gold")], "user_id long, tier string"
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .json(srcdir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_enrich_static(stream, dim, on="user_id")
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.event_id: r.tier for r in spark.read.parquet(outdir).collect()}
    assert rows == {1: "gold", 2: None}
