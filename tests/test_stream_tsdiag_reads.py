"""Ljung-Box / Durbin-Watson reads over the Page-Hinkley stream store
(r11, wave 114): the day-grain cents state that powers the PH monitor
also serves the residual diagnostics — one stream store for the whole
trend-diagnostics family. Bit-parity: stream batches through
``stream_page_hinkley``, then each ``*_from_state`` read must equal its
batch operator on the union's daily rollup."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.operators.tsdiag import (
    durbin_watson_daily,
    ljung_box_daily,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.pagehinkley_stream import (
    durbin_watson_from_state,
    ljung_box_from_state,
    stream_page_hinkley,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(b: int) -> list[dict]:
    if b == 1:
        return []  # empty batch: the first-delta path must still merge
    out = []
    for i in range(10):
        day = (b + i) % 6 + 1
        out.append(
            {
                "ts": f"2025-03-{day:02d}T09:0{i % 6}:00",
                "event_type": "purchase" if i % 3 != 2 else "click",
                "value": 2.0 + (i % 4) * 0.5 + b * 0.25,
            }
        )
    return out


def test_tsdiag_reads_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    all_rows: list[dict] = []
    for b in range(4):
        rows = _rows(b)
        all_rows.extend(rows)
        with open(os.path.join(src, f"b{b}.json"), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        q = stream_page_hinkley(
            spark, src, SCHEMA, state, ck, compact_threshold=2
        )
        q.awaitTermination()
    daily = (
        spark.createDataFrame(
            [
                (r["ts"].replace("T", " "), r["event_type"], r["value"])
                for r in all_rows
            ],
            "ts string, event_type string, value double",
        )
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.to_date("ts").alias("day"),
            F.round(F.col("value").cast("double") * 100, 0)
            .cast("long")
            .alias("__cents"),
        )
        .groupBy("day")
        .agg(F.sum("__cents").cast("long").alias("x"))
    )
    got_lb = sorted(map(repr, ljung_box_from_state(spark, state).collect()))
    want_lb = sorted(
        map(repr, ljung_box_daily(daily, "day", "x").collect())
    )
    assert got_lb == want_lb
    got_dw = sorted(
        map(repr, durbin_watson_from_state(spark, state).collect())
    )
    want_dw = sorted(
        map(repr, durbin_watson_daily(daily, "day", "x").collect())
    )
    assert got_dw == want_dw


def test_tsdiag_reads_empty_state(spark, tmp_path):
    """No batch ever wrote: reads degrade via live_state's typed-empty
    path — DW yields the one-row NULL contract, LB the 7 NULL rows."""
    state = str(tmp_path / "never_written")
    dw = durbin_watson_from_state(spark, state).collect()
    assert len(dw) == 1 and dw[0].dw is None
    lb = ljung_box_from_state(spark, state).collect()
    assert len(lb) == 7
    assert all(r.lb_stat is None and r.bp_stat is None for r in lb)
