"""Streaming Page-Hinkley shift monitor (SURVEY.md §2.9 family; the
streaming twin of ``behavior.page_hinkley``).

Page-Hinkley's state is NOT the running statistic itself (m_t depends on
every prefix mean, so naively it looks sequential) — but the statistic is
a pure function of the per-day integer-cents rollup, and THAT is a
mergeable grid: summing per-day cents across micro-batches commutes with
late/out-of-order arrivals by construction. So the state table is a
(day, x) grid merged across batches, bounded by the corpus day span (the
cusum discipline), and :func:`ph_from_state` re-walks the exact int64
PH recursion over the merged grid — bit-identical to the batch operator
over everything that has streamed through (pinned by the batch/stream
parity pytest).

Replay discipline is the ks_stream contract: one ``__batch_id`` delta
partition per batch under dynamic partition overwrite (a replayed batch
overwrites its own delta), ``sweep_stale`` BEFORE the empty-batch early
return (fresh-checkpoint batch-0 reruns clear the dead run's state),
``compact_state`` folds committed deltas into a coverage-encoded base,
and ``on_batch`` fires after the state write and before the checkpoint
commit (the crash-replay contract window —
tests/test_stream_crash_replay.py kills there and asserts losslessness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

STATE_SCHEMA = T.StructType(
    [
        T.StructField("day", T.DateType()),
        T.StructField("x", T.LongType()),
        T.StructField("__batch_id", T.LongType()),
    ]
)


def _batch_daily(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    value_col: str,
    target_type: str,
) -> DataFrame:
    return (
        df.filter(F.col(type_col) == target_type)
        # NULL ts would land a NULL day in the state grid, where the
        # ordered PH walk's NULL placement diverges across engines
        # (Spark NULLS FIRST vs DuckDB NULLS LAST) — same guard as the
        # survival operators (r9 ADVICE).
        .filter(F.col(ts_col).isNotNull())
        .select(
            F.to_date(F.col(ts_col)).alias("day"),
            F.round(F.col(value_col).cast("double") * 100, 0)
            .cast("long")
            .alias("__cents"),
        )
        .groupBy("day")
        .agg(F.sum("__cents").cast("long").alias("x"))
    )


def ph_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Page-Hinkley over the merged live state — the batch operator's
    exact int64 walk over per-day cents summed across deltas."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import page_hinkley
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

    daily = (
        live_state(
            spark, state_path, schema="day date, x long, __batch_id long"
        )
        .groupBy("day")
        .agg(F.sum("x").cast("long").alias("x"))
    )
    return page_hinkley(daily, "day", "x")


def stream_page_hinkley(
    spark: SparkSession,
    source_path: str,
    source_schema: T.StructType,
    state_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    target_type: str = "purchase",
    trigger_once: bool = True,
    compact_threshold: int = 64,
    on_batch=None,
) -> StreamingQuery:
    """Stream event JSON rows into the per-day cents state; query the
    up-to-date Page-Hinkley trajectory any time with
    :func:`ph_from_state`."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        compact_state,
        sweep_stale,
    )

    raw = spark.readStream.schema(source_schema).json(source_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sweep_stale(spark, state_path, batch_id)
        if batch_df.isEmpty():
            return
        delta = _batch_daily(
            batch_df, ts_col, type_col, value_col, target_type
        ).withColumn("__batch_id", F.lit(batch_id).cast("long"))
        # the target-type / NULL-ts filters can empty a non-empty batch;
        # writing an empty first delta leaves a file-less state dir that
        # parquet schema inference rejects (r10 stream fuzz)
        if delta.isEmpty():
            return
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(state_path)
        )
        compact_state(
            spark, state_path, batch_id,
            key_cols=["day"],
            aggs=[F.sum("x").cast("long").alias("x")],
            threshold=compact_threshold,
        )
        # crash-window hook (see tests/test_stream_crash_replay.py)
        if on_batch is not None:
            on_batch(batch_id)

    writer = (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _daily_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Merged per-day cents series from the live state — the shared
    input for every day-grain read over this store (deltas are
    associative, so the merge is bit-identical to a one-pass rollup
    of everything streamed)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

    return (
        live_state(
            spark, state_path, schema="day date, x long, __batch_id long"
        )
        .groupBy("day")
        .agg(F.sum("x").cast("long").alias("x"))
    )


def ljung_box_from_state(
    spark: SparkSession, state_path: str, max_lag: int = 7
) -> DataFrame:
    """Cumulative Ljung-Box / Box-Pierce over the merged live state —
    the r11 wave-114 diagnostics on the SAME day-grain store the
    Page-Hinkley monitor maintains, so one stream serves the whole
    trend-diagnostics family."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.tsdiag import ljung_box_daily

    return ljung_box_daily(
        _daily_from_state(spark, state_path), "day", "x", max_lag=max_lag
    )


def durbin_watson_from_state(
    spark: SparkSession, state_path: str
) -> DataFrame:
    """Durbin-Watson over the merged live state (see
    ``ljung_box_from_state``)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.tsdiag import (
        durbin_watson_daily,
    )

    return durbin_watson_daily(_daily_from_state(spark, state_path), "day", "x")
