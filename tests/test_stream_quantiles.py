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
