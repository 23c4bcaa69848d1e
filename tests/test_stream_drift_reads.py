"""The W1/CvM/energy state reads over the ks_stream store (r10): one
stream store serves all four drift functionals. Bit-parity: stream
rows through ``stream_ks_drift`` across 3 micro-batches, then each
``*_from_state`` read must equal its batch operator on the union —
counts are associative, so merged state == one-pass quantization."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("is_right", T.BooleanType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _drive(spark, tmp_path, batches):
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import stream_ks_drift

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    for b, rows in enumerate(batches):
        with open(os.path.join(src, f"b{b}.json"), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        q = stream_ks_drift(
            spark, src, SCHEMA, state, ck, compact_threshold=2
        )
        q.awaitTermination()
    return state


def test_drift_reads_match_batch_operators(spark, tmp_path):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import (
        anderson_darling_two_sample,
        cvm_two_sample,
        energy_distance,
        wasserstein_1,
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        ad_from_state,
        cvm_from_state,
        energy_from_state,
        w1_from_state,
    )

    rows = [
        {"is_right": i % 2 == 1, "value": (i * 7) % 23 + i * 0.25}
        for i in range(60)
    ]
    batches = [rows[:20], rows[20:40], rows[40:]]
    state = _drive(spark, tmp_path, batches)

    union = spark.createDataFrame(
        [(r["is_right"], r["value"]) for r in rows], SCHEMA
    )
    for read_fn, batch_fn in (
        (w1_from_state, wasserstein_1),
        (cvm_from_state, cvm_two_sample),
        (energy_from_state, energy_distance),
        (ad_from_state, anderson_darling_two_sample),
    ):
        streamed = read_fn(spark, state).collect()
        batch = batch_fn(union, "is_right", "value", scale=100).collect()
        assert [r.asDict() for r in streamed] == [
            r.asDict() for r in batch
        ], read_fn.__name__


def test_drift_reads_empty_state(spark, tmp_path):
    """No batch ever wrote: every read degrades to the one-row NULL
    contract via live_state's typed-empty path."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        cvm_from_state,
        energy_from_state,
        w1_from_state,
    )

    state = str(tmp_path / "never_written")
    for fn, col in (
        (w1_from_state, "w1"),
        (cvm_from_state, "cvm_t"),
        (energy_from_state, "energy_d"),
    ):
        rows = fn(spark, state).collect()
        assert len(rows) == 1 and rows[0][col] is None, fn.__name__


def test_drift_golden_through_stream(spark, tmp_path):
    # the wave-107 golden through the stream store: left {1,2}, right
    # {2,3} -> W1 = 1.0, CvM = 0.1875, energy = 1.0
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        cvm_from_state,
        energy_from_state,
        w1_from_state,
    )

    batches = [
        [{"is_right": False, "value": 1.0}],
        [{"is_right": False, "value": 2.0}, {"is_right": True, "value": 2.0}],
        [{"is_right": True, "value": 3.0}],
    ]
    state = _drive(spark, tmp_path, batches)
    assert w1_from_state(spark, state).collect()[0].w1 == pytest.approx(1.0)
    assert cvm_from_state(spark, state).collect()[0].cvm_t == pytest.approx(
        0.1875
    )
    assert energy_from_state(spark, state).collect()[
        0
    ].energy_d == pytest.approx(1.0)
