"""Streaming HLL: register max-merge across micro-batches is
bit-identical to batch-sketching the union, and replays don't corrupt."""

import json
import os
import shutil

from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import hll_distinct
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.hll_stream import (
    read_hll_estimate,
    stream_hll_distinct,
)

SCHEMA = T.StructType([T.StructField("user_id", T.LongType())])


def _write(srcdir, name, ids):
    with open(os.path.join(srcdir, name), "w") as f:
        for i in ids:
            f.write(json.dumps({"user_id": i}) + "\n")


def _run(spark, src, regs, ckpt):
    q = stream_hll_distinct(spark, src, SCHEMA, regs, ckpt)
    q.awaitTermination(180)


def test_stream_merge_equals_batch_sketch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    regs = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    batch1 = list(range(0, 400))
    batch2 = list(range(200, 700))  # overlaps batch1

    _write(str(src), "b1.json", batch1)
    _run(spark, str(src), regs, ckpt)
    _write(str(src), "b2.json", batch2)
    _run(spark, str(src), regs, ckpt)

    streamed = read_hll_estimate(spark, regs).collect()[0].hll_estimate
    union = spark.createDataFrame(
        [(i,) for i in set(batch1) | set(batch2)], "user_id long"
    )
    batch = hll_distinct(union, "user_id").collect()[0].hll_estimate
    assert streamed == batch  # bit-identical, not approximately equal


def test_empty_batch_gap_keeps_prior_merge_and_survives_replay(
    spark, tmp_path
):
    """Empty micro-batches advance batch ids WITHOUT writing partitions.
    Retention must keep the two largest PRESENT partition ids — id
    arithmetic (old_id <= batch_id - 2) would delete the only prior full
    merge after a gap, and a crash-before-commit replay would then sweep
    the newest partition too, losing ALL accumulated state."""
    src = tmp_path / "src"
    src.mkdir()
    regs = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")

    first = list(range(300))
    _write(str(src), "b0.json", first)
    _run(spark, str(src), regs, ckpt)  # batch 0 -> partition 0
    # two EMPTY files: batches 1 and 2 run with zero rows and write nothing
    _write(str(src), "e1.json", [])
    _run(spark, str(src), regs, ckpt)
    _write(str(src), "e2.json", [])
    _run(spark, str(src), regs, ckpt)
    second = list(range(300, 500))
    _write(str(src), "b3.json", second)
    _run(spark, str(src), regs, ckpt)  # batch 3 -> partition 3

    present = sorted(
        int(p.split("=")[1])
        for p in os.listdir(regs)
        if p.startswith("__batch_id=")
    )
    # gap-aware retention: partition 0 (the only prior full merge) stays
    assert present == [0, 3]

    # crash-before-commit of batch 3, then replay: the sweep deletes
    # partition 3 and the recompute must find partition 0 intact
    os.remove(os.path.join(ckpt, "commits", "3"))
    crc = os.path.join(ckpt, "commits", ".3.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, str(src), regs, ckpt)
    streamed = read_hll_estimate(spark, regs).collect()[0].hll_estimate
    union = spark.createDataFrame(
        [(i,) for i in set(first) | set(second)], "user_id long"
    )
    batch = hll_distinct(union, "user_id").collect()[0].hll_estimate
    assert streamed == batch


def test_replay_keeps_registers_consistent(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    regs = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    _write(str(src), "b1.json", list(range(300)))
    _run(spark, str(src), regs, ckpt)
    before = read_hll_estimate(spark, regs).collect()[0].hll_estimate

    # force a replay of the committed batch
    shutil.rmtree(os.path.join(ckpt, "commits"), ignore_errors=True)
    _run(spark, str(src), regs, ckpt)
    after = read_hll_estimate(spark, regs).collect()[0].hll_estimate
    assert after == before
