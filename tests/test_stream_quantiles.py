"""Streaming grid-quantile sketch: batch/stream parity, closed-form
quantiles, compaction-bounded state."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import (
    grid_quantile_state,
    grid_quantiles,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.quantile_stream import (
    quantiles_from_state,
    stream_quantile_counts,
)

SCHEMA = T.StructType([T.StructField("value", T.DoubleType())])


def test_grid_quantiles_closed_form(spark):
    # values 1..100 -> q0.5 target rank 50 -> value 50; q0.9 -> 90
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "value double"
    )
    state = grid_quantile_state(df, "value", scale=100)
    out = {
        r.q: (r.value, r.rank_target, r.n_total)
        for r in grid_quantiles(state, [0.5, 0.9, 1.0], scale=100).collect()
    }
    assert out[0.5] == (50.0, 50, 100)
    assert out[0.9] == (90.0, 90, 100)
    assert out[1.0] == (100.0, 100, 100)


def test_grid_quantiles_repeated_values_and_pitch(spark):
    # 10x value 1.234 and 10x 5.678, scale 100 -> grid 123 and 568
    df = spark.createDataFrame(
        [(1.234,)] * 10 + [(5.678,)] * 10, "value double"
    )
    out = {
        r.q: r.value
        for r in grid_quantiles(
            grid_quantile_state(df, "value"), [0.5, 0.75]
        ).collect()
    }
    assert out[0.5] == 1.23   # rank 10 falls in the first value block
    assert out[0.75] == 5.68  # quantized to the grid: 1/scale pitch


def test_empty_batch0_still_sweeps_dead_run_state(spark, tmp_path):
    """A fresh-checkpoint rerun whose batch 0 happens to be EMPTY must
    still clear the dead run's state — sweep_stale runs before the
    empty-batch early return — or batch 1+ double-counts it."""
    state = str(tmp_path / "state")

    # dead run: checkpoint ck1 over src1 leaves state partition 0 behind
    src1 = str(tmp_path / "src1")
    os.makedirs(src1)
    with open(os.path.join(src1, "b0.json"), "w") as fh:
        for v in range(1, 11):
            fh.write(json.dumps({"value": float(v)}) + "\n")
    stream_quantile_counts(
        spark, src1, SCHEMA, state, str(tmp_path / "ck1"), trigger_once=True
    ).awaitTermination()
    assert any(p.startswith("__batch_id=") for p in os.listdir(state))

    # fresh checkpoint ck2 over src2 whose batch 0 is an EMPTY file
    src2 = str(tmp_path / "src2")
    os.makedirs(src2)
    open(os.path.join(src2, "empty.json"), "w").close()
    stream_quantile_counts(
        spark, src2, SCHEMA, state, str(tmp_path / "ck2"), trigger_once=True
    ).awaitTermination()
    # batch 1: real data; state must reflect ONLY the new run
    new_vals = [float(v) for v in range(100, 110)]
    with open(os.path.join(src2, "b1.json"), "w") as fh:
        for v in new_vals:
            fh.write(json.dumps({"value": v}) + "\n")
    stream_quantile_counts(
        spark, src2, SCHEMA, state, str(tmp_path / "ck2"), trigger_once=True
    ).awaitTermination()

    out = {
        r.q: (r.value, r.n_total)
        for r in quantiles_from_state(spark, state, [0.5, 1.0]).collect()
    }
    assert out[1.0][1] == 10  # dead run's 10 rows NOT double-counted
    assert out[1.0][0] == 109.0


def test_stream_matches_batch_and_compacts(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    all_vals = []
    for b in range(8):
        vals = [b * 10 + i + 0.5 for i in range(10)]
        all_vals += vals
        with open(os.path.join(src, f"b{b}.json"), "w") as fh:
            for v in vals:
                fh.write(json.dumps({"value": v}) + "\n")
        q = stream_quantile_counts(
            spark, src, SCHEMA, state, str(tmp_path / "ck"),
            trigger_once=True, compact_threshold=3,
        )
        q.awaitTermination()
    streamed = {
        r.q: (r.value, r.n_total)
        for r in quantiles_from_state(spark, state, [0.25, 0.5, 0.95]).collect()
    }
    batch_df = spark.createDataFrame([(v,) for v in all_vals], "value double")
    batch = {
        r.q: (r.value, r.n_total)
        for r in grid_quantiles(
            grid_quantile_state(batch_df, "value"), [0.25, 0.5, 0.95]
        ).collect()
    }
    assert streamed == batch
    parts = [
        int(p.split("=")[1])
        for p in os.listdir(state)
        if p.startswith("__batch_id=")
    ]
    assert len(parts) <= 5 and min(parts) < 0  # compacted into a base
