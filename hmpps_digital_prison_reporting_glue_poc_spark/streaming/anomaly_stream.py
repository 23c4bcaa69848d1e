"""Streaming robust daily-volume anomaly monitor (SURVEY.md §2.9
family; batch twin: ``operators/behavior.py daily_anomaly_robust_z``).

Maintains per-day event counts incrementally: each micro-batch's
(day, count) delta MERGEs into a storage-backed state table (counts are
associative — the merged state is bit-identical to a batch aggregation
over everything streamed), and the median/MAD robust z-scores recompute
from the state after every batch. The state is date-span-sized (one row
per observed day per un-compacted delta), so per-batch recompute cost is
independent of how much history has flowed through — the same bounded-
state argument as the KS and quantile streams.

Replay/compaction machinery is shared with ks/cms/quantile streams:
``__batch_id``-keyed dynamic partition overwrite (writer-level option —
foreachBatch clones the session, session conf is ignored), stale-
partition sweep on every batch, and coverage-encoded base compaction
(``state_compact``) so a long stream holds O(threshold) state dirs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

STATE_SCHEMA = T.StructType(
    [
        T.StructField("day", T.DateType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("__batch_id", T.LongType()),
    ]
)


def anomaly_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Robust z-scores from the merged day-count state — the same
    median/MAD closed form as the batch operator, over counts summed
    across batch deltas. Returns (day, n_events, robust_z)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

    daily = (
        live_state(
            spark, state_path,
            schema="day date, n_events long, __batch_id long",
        )
        .groupBy("day")
        .agg(F.sum("n_events").cast("long").alias("n_events"))
    )
    med = daily.agg(
        F.percentile(F.col("n_events").cast("double"), F.lit(0.5)).alias(
            "__med"
        )
    )
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day",
        "n_events",
        "__med",
        F.abs(F.col("n_events").cast("double") - F.col("__med")).alias(
            "__dev"
        ),
    )
    mad = dev.agg(F.percentile(F.col("__dev"), F.lit(0.5)).alias("__mad"))
    z = F.when(
        F.col("__mad") > 0.0,
        (F.col("n_events").cast("double") - F.col("__med"))
        / (F.lit(1.4826) * F.col("__mad")),
    )
    return dev.crossJoin(F.broadcast(mad)).select(
        "day", "n_events", z.alias("robust_z")
    )


def stream_daily_anomaly(
    spark: SparkSession,
    source_path: str,
    source_schema: T.StructType,
    state_path: str,
    checkpoint_dir: str,
    target_type: str = "purchase",
    ts_col: str = "ts",
    type_col: str = "event_type",
    on_batch=None,
    trigger_once: bool = True,
    compact_threshold: int = 64,
) -> StreamingQuery:
    """Stream event JSON into the day-count state; after each batch the
    merged state yields up-to-date robust z-scores (fetch with
    ``anomaly_from_state``, or observe per-batch via ``on_batch``)."""
    raw = spark.readStream.schema(source_schema).json(source_path)

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        compact_state,
        sweep_stale,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # sweep before the empty-batch return: an empty batch 0 on a
        # fresh checkpoint must still clear the dead run's state
        sweep_stale(spark, state_path, batch_id)
        if batch_df.isEmpty():
            return
        delta = (
            batch_df.filter(F.col(type_col) == target_type)
            .groupBy(F.to_date(F.col(ts_col)).alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .withColumn("__batch_id", F.lit(batch_id).cast("long"))
        )
        # the target-type filter can empty a non-empty batch; writing an
        # empty first delta leaves a file-less state dir that parquet
        # schema inference rejects (r10 stream fuzz)
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
            aggs=[F.sum("n_events").cast("long").alias("n_events")],
            threshold=compact_threshold,
        )
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
