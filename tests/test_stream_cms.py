"""Streaming CMS: cell-wise delta merge across micro-batches equals the
one-pass batch sketch, and replays overwrite their delta (no double-add
— the non-idempotent-merge retry hazard HLL doesn't have)."""

import json
import os
import shutil

from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import (
    cms_token_estimates,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.cms_stream import (
    read_cms_estimate,
    stream_cms_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

B1 = [(1, "apple apple banana"), (2, "apple cherry")]
B2 = [(3, "banana banana apple"), (4, "cherry")]


def _write(srcdir, name, rows):
    with open(os.path.join(srcdir, name), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run(spark, src, cells, ckpt):
    q = stream_cms_counts(spark, src, SCHEMA, cells, ckpt)
    q.awaitTermination(180)


def test_stream_cms_equals_batch_sketch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    cells = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")
    _write(str(src), "b1.json", B1)
    _run(spark, str(src), cells, ckpt)
    _write(str(src), "b2.json", B2)
    _run(spark, str(src), cells, ckpt)

    union = spark.createDataFrame(B1 + B2, "doc_id long, text string")
    batch = {
        r.token: r.cms_estimate
        for r in cms_token_estimates(union, probe_k=10).collect()
    }
    toks = spark.createDataFrame(
        [(t,) for t in batch], "token string"
    )
    streamed = {
        r.token: r.cms_estimate
        for r in read_cms_estimate(spark, cells, toks).collect()
    }
    assert streamed == batch  # bit-identical cell sums
    assert streamed["apple"] == 4 and streamed["banana"] == 3


def test_cms_replay_does_not_double_add(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    cells = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")
    _write(str(src), "b1.json", B1)
    _run(spark, str(src), cells, ckpt)
    toks = spark.createDataFrame([("apple",)], "token string")
    before = read_cms_estimate(spark, cells, toks).collect()[0].cms_estimate
    assert before == 3

    # force a replay: addition is NOT idempotent, so this is the test
    # that matters for CMS (a naive append sink would report 6)
    shutil.rmtree(os.path.join(ckpt, "commits"), ignore_errors=True)
    _run(spark, str(src), cells, ckpt)
    after = read_cms_estimate(spark, cells, toks).collect()[0].cms_estimate
    assert after == 3
