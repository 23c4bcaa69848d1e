"""The Kuiper/Mood/Cliffs/Cucconi/Ansari state reads over the ks_stream
store (r11, waves 112/113/115/121): ONE stream store now serves all ten
grid functionals. Bit-parity: stream rows through ``stream_ks_drift`` across
3 micro-batches, then each ``*_from_state`` read must equal its batch
operator on the union — counts are associative, so merged state == a
one-pass quantization of everything streamed."""

from __future__ import annotations

import json
import os

import pytest
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


def test_rank_reads_match_batch_operators(spark, tmp_path):
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import kuiper_two_sample
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.rankstats import (
        ansari_bradley_two_sample,
        cliffs_delta_two_sample,
        cucconi_two_sample,
        mood_scale_two_sample,
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        ansari_from_state,
        cliffs_from_state,
        cucconi_from_state,
        kuiper_from_state,
        mood_from_state,
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
        (kuiper_from_state, kuiper_two_sample),
        (mood_from_state, mood_scale_two_sample),
        (cliffs_from_state, cliffs_delta_two_sample),
        (cucconi_from_state, cucconi_two_sample),
        (ansari_from_state, ansari_bradley_two_sample),
    ):
        streamed = read_fn(spark, state).collect()
        batch = batch_fn(union, "is_right", "value", scale=100).collect()
        assert [r.asDict() for r in streamed] == [
            r.asDict() for r in batch
        ], read_fn.__name__


def test_rank_reads_empty_state(spark, tmp_path):
    """No batch ever wrote: every read degrades to the one-row NULL
    contract via live_state's typed-empty path."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        ansari_from_state,
        cliffs_from_state,
        cucconi_from_state,
        kuiper_from_state,
        mood_from_state,
    )

    state = str(tmp_path / "never_written")
    for fn, col in (
        (kuiper_from_state, "kuiper_v"),
        (mood_from_state, "mood_t"),
        (cliffs_from_state, "cliffs_delta"),
        (cucconi_from_state, "cucconi_c"),
        (ansari_from_state, "ab_stat"),
    ):
        rows = fn(spark, state).collect()
        assert len(rows) == 1 and rows[0][col] is None, fn.__name__


def test_rank_golden_through_stream(spark, tmp_path):
    # wave-112/115 goldens through the stream store: left {1,3},
    # right {2,4} -> Kuiper d_plus = .5, d_minus = 0; Cliff's
    # delta = (1-3)/4 = -.5
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.ks_stream import (
        cliffs_from_state,
        kuiper_from_state,
    )

    batches = [
        [{"is_right": False, "value": 1.0}],
        [{"is_right": False, "value": 3.0}, {"is_right": True, "value": 2.0}],
        [{"is_right": True, "value": 4.0}],
    ]
    state = _drive(spark, tmp_path, batches)
    k = kuiper_from_state(spark, state).collect()[0]
    assert k.d_plus == pytest.approx(0.5)
    assert k.d_minus == pytest.approx(0.0)
    assert k.kuiper_v == pytest.approx(0.5)
    c = cliffs_from_state(spark, state).collect()[0]
    assert (c.pair_gt, c.pair_lt) == (1, 3)
    assert c.cliffs_delta == pytest.approx(-0.5)
