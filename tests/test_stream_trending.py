"""Streaming trending tokens: finalized windows rank exactly once, from
final counts; open windows (not yet past the watermark) do not emit."""

import json
import os

from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.streaming.trending import (
    stream_trending_tokens,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write(srcdir, name, rows):
    with open(os.path.join(srcdir, name), "w") as f:
        for doc_id, ts, text in rows:
            f.write(
                json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n"
            )


def test_trending_topk_finalized_windows(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def run():
        q = stream_trending_tokens(
            spark, src, SCHEMA, out, ckpt,
            k=2, window_duration="10 minutes", watermark_delay="5 minutes",
        )
        q.awaitTermination(180)

    # window [00:00, 00:10): 'spark' x3, 'data' x2, 'etl' x1
    _write(
        src,
        "b1.json",
        [
            (1, "2024-01-01 00:01:00", "spark data"),
            (2, "2024-01-01 00:02:00", "spark data etl"),
            (3, "2024-01-01 00:03:00", "spark"),
        ],
    )
    run()
    # watermark has not passed 00:10 yet -> nothing finalized
    files = []
    if os.path.exists(out):
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert not files, "open window must not emit"

    # an event far past the window pushes the watermark beyond 00:10,
    # finalizing the first window; its own window stays open
    _write(src, "b2.json", [(4, "2024-01-01 01:00:00", "late batch")])
    run()
    rows = spark.read.parquet(out).collect()
    got = {(r.token, r.rank, r.n_occurrences) for r in rows}
    assert got == {("spark", 1, 3), ("data", 2, 2)}
    for r in rows:
        assert r.window_start.minute == 0 and r.window_end.minute == 10
