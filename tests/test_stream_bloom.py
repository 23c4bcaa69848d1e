"""Streaming Bloom decontamination: micro-batch verdicts match the batch
operator exactly, across multiple batches, and replays don't duplicate."""

import json
import os

from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.retrieval import (
    bloom_bit_positions,
    bloom_probe_docs,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.bloom_stream import (
    stream_bloom_decontaminate,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

EVAL_ROWS = [(100, "alpha beta gamma delta"), (200, "one two three")]
BATCH1 = [(1, "xx alpha beta gamma yy"), (2, "clean words only here")]
BATCH2 = [(3, "one two three"), (4, "hi")]  # doc 4: no trigram -> no row


def _write(srcdir, name, rows):
    with open(os.path.join(srcdir, name), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_matches_batch_verdicts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    bits_path = str(tmp_path / "bits")
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    bloom_bit_positions(_docs(spark, EVAL_ROWS)).write.parquet(bits_path)

    _write(str(src), "b1.json", BATCH1)
    q = stream_bloom_decontaminate(
        spark, str(src), DOC_SCHEMA, bits_path, out, ckpt
    )
    q.awaitTermination(180)
    _write(str(src), "b2.json", BATCH2)
    q = stream_bloom_decontaminate(
        spark, str(src), DOC_SCHEMA, bits_path, out, ckpt
    )
    q.awaitTermination(180)

    got = {
        r.doc_id: (r.n_grams, r.n_flagged)
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        r.doc_id: (r.n_grams, r.n_flagged)
        for r in bloom_probe_docs(
            _docs(spark, BATCH1 + BATCH2),
            bloom_bit_positions(_docs(spark, EVAL_ROWS)),
        ).collect()
    }
    assert got == expected
    assert 4 not in got  # no trigrams -> no verdict row, like the batch op
    assert got[1][1] >= 1 and got[3] == (1, 1)


def test_replay_overwrites_instead_of_duplicating(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    bits_path = str(tmp_path / "bits")
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    bloom_bit_positions(_docs(spark, EVAL_ROWS)).write.parquet(bits_path)

    _write(str(src), "b1.json", BATCH1)
    q = stream_bloom_decontaminate(
        spark, str(src), DOC_SCHEMA, bits_path, out, ckpt
    )
    q.awaitTermination(180)
    n_first = spark.read.parquet(out).count()

    # force a replay of the committed batch: delete the sink commit
    # marker so the engine re-runs micro-batch 0 against existing output
    import shutil

    shutil.rmtree(os.path.join(ckpt, "commits"), ignore_errors=True)
    q = stream_bloom_decontaminate(
        spark, str(src), DOC_SCHEMA, bits_path, out, ckpt
    )
    q.awaitTermination(180)

    after = spark.read.parquet(out)
    assert after.count() == n_first  # replaced its partition, no dupes
    assert after.select("doc_id").distinct().count() == n_first
