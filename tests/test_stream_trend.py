"""Streaming Cochran-Armitage trend monitor: batch/stream parity (the
merged state must reproduce the batch operator bit-for-bit), incremental
updates across batches, and compaction-bounded state."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.evaluation import (
    cochran_armitage_trend,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.trend_stream import (
    stream_trend_drift,
    trend_from_state,
)

SCHEMA = T.StructType(
    [
        T.StructField("score", T.LongType()),
        T.StructField("label", T.BooleanType()),
    ]
)


def _rows(b: int) -> list[dict]:
    out = []
    for i in range(30):
        s = (b + i) % 5
        out.append({"score": s, "label": (i % (s + 2)) == 0})
    return out


def _parts(path: str) -> list[int]:
    return [
        int(p.split("=", 1)[1])
        for p in os.listdir(path)
        if p.startswith("__batch_id=")
    ]


def test_stream_matches_batch_and_updates(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    all_rows: list[dict] = []
    prev_z = None
    n_distinct_z = 0
    for b in range(6):
        rows = _rows(b)
        all_rows.extend(rows)
        with open(os.path.join(src, f"b{b}.json"), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        q = stream_trend_drift(
            spark, src, SCHEMA, state, ck, compact_threshold=3
        )
        q.awaitTermination()
        got = trend_from_state(spark, state).collect()[0]
        batch_df = spark.createDataFrame(
            [(r["score"], r["label"]) for r in all_rows],
            "score long, label boolean",
        )
        want = cochran_armitage_trend(batch_df, "score", "label").collect()[0]
        assert repr(got) == repr(want)  # bit-identical incl. z doubles
        if got.z_trend != prev_z:
            n_distinct_z += 1
        prev_z = got.z_trend
    assert n_distinct_z >= 3  # the statistic actually moves across batches
    # compaction bounded the partition count (threshold 3, 6 batches)
    assert len(_parts(state)) < 6
    assert min(_parts(state)) < 0  # a base partition exists


def test_same_checkpoint_rerun_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    with open(os.path.join(src, "b0.json"), "w") as fh:
        for r in _rows(0):
            fh.write(json.dumps(r) + "\n")
    for _ in range(2):  # second run sees no new files -> no state change
        q = stream_trend_drift(spark, src, SCHEMA, state, ck)
        q.awaitTermination()
    got = trend_from_state(spark, state).collect()[0]
    assert got.n == len(_rows(0))
