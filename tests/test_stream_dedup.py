"""Cross-micro-batch streaming dedup: re-delivered keys within the
watermark horizon are dropped exactly once, distinct keys all survive."""

import json
import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.streaming.dedup_stream import (
    stream_dedup,
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
            f.write(
                json.dumps({"event_id": event_id, "ts": ts, "value": value})
                + "\n"
            )


def _run(spark, srcdir, outdir, ckpt):
    stream = (
        spark.readStream.schema(SRC_SCHEMA)
        .json(srcdir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_dedup(stream, ["event_id"], "ts", "1 hour")
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_dedup_drops_redeliveries_across_batches(spark, tmp_path):
    srcdir = os.path.join(str(tmp_path), "src")
    outdir = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(srcdir)

    # batch 1: ids 1-3, with an in-batch duplicate of id 2
    _write(srcdir, "b1.json", [
        (1, "2024-01-01 10:00:00", 1.0),
        (2, "2024-01-01 10:01:00", 2.0),
        (2, "2024-01-01 10:02:00", 99.0),   # in-batch re-delivery
        (3, "2024-01-01 10:03:00", 3.0),
    ])
    _run(spark, srcdir, outdir, ckpt)

    # batch 2: re-delivery of id 3 (within the 1h watermark -> dropped)
    # plus a genuinely new id 4
    _write(srcdir, "b2.json", [
        (3, "2024-01-01 10:10:00", 98.0),
        (4, "2024-01-01 10:20:00", 4.0),
    ])
    _run(spark, srcdir, outdir, ckpt)

    out = spark.read.parquet(outdir)
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3, 4]
    # the FIRST arrival won: id 2 kept value 2.0, id 3 kept 3.0
    vals = {r.event_id: r.value for r in out.collect()}
    assert vals[2] == 2.0 and vals[3] == 3.0


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_docs(srcdir, name, rows):
    with open(os.path.join(srcdir, name), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_stream_ingest_dedup_across_batches(spark, tmp_path):
    """Batch 2 must not re-admit content accepted in batch 1 (the store is
    the cross-batch state); intra-batch dupes keep the lowest id."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.dedup_stream import (
        stream_ingest_dedup,
    )

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    store = os.path.join(str(tmp_path), "store")
    corpus = os.path.join(str(tmp_path), "corpus")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def run():
        q = stream_ingest_dedup(
            spark, src, DOC_SCHEMA, store, corpus, ckpt, trigger_once=True
        )
        q.awaitTermination(180)

    _write_docs(src, "b1.json", [(1, "alpha"), (2, "beta"), (3, "beta")])
    run()
    got1 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got1 == {1, 2}  # intra-batch dupe 3 dropped

    _write_docs(
        src, "b2.json", [(10, "alpha"), (11, "gamma"), (12, "gamma")]
    )
    run()
    rows = spark.read.parquet(corpus).collect()
    got2 = {r.doc_id for r in rows}
    assert got2 == {1, 2, 11}  # 10 (store dup) and 12 (intra dup) dropped
    texts = sorted(r.text for r in rows)
    assert texts == ["alpha", "beta", "gamma"]
    # the store carries exactly the accepted fingerprints
    fps = {r.doc_id for r in spark.read.parquet(store).collect()}
    assert fps == {1, 2, 11}


def test_stream_ingest_dedup_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a batch that committed its sinks but
    died before the checkpoint commit is REPLAYED with the same batch_id.
    Deleting the checkpoint's commits dir forces exactly that replay; the
    partition-overwrite sinks must not duplicate the survivors."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.dedup_stream import (
        stream_ingest_dedup,
    )

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    store = os.path.join(str(tmp_path), "store")
    corpus = os.path.join(str(tmp_path), "corpus")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def run():
        q = stream_ingest_dedup(
            spark, src, DOC_SCHEMA, store, corpus, ckpt, trigger_once=True
        )
        q.awaitTermination(180)

    _write_docs(src, "b1.json", [(1, "alpha"), (2, "beta"), (3, "beta")])
    run()
    # simulate died-after-sink-writes-before-checkpoint-commit
    shutil.rmtree(os.path.join(ckpt, "commits"))
    run()
    rows = spark.read.parquet(corpus).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]
    assert sorted(r.text for r in rows) == ["alpha", "beta"]
    fps = sorted(r.doc_id for r in spark.read.parquet(store).collect())
    assert fps == [1, 2]
