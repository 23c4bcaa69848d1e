"""Streaming Cochran-Armitage trend monitor (SURVEY.md §2.9 family; the
streaming twin of ``evaluation.cochran_armitage_trend``).

The trend test's five sufficient statistics (N, R, Σsn, Σsr, Σs²n) are all
sums over a per-SCORE count rollup — associative, so the state table is a
(score, n, r) grid merged across micro-batches, and the z statistic
recomputed from the merged state after any batch is bit-identical to the
batch operator over everything that has streamed through (pinned by the
batch/stream parity pytest).

Replay discipline is the ks_stream contract: one ``__batch_id`` delta
partition per batch under dynamic partition overwrite (a replayed batch
overwrites its own delta), ``sweep_stale`` BEFORE the empty-batch early
return (fresh-checkpoint batch-0 reruns clear the dead run's state),
``compact_state`` folds committed deltas into a coverage-encoded base, and
``on_batch`` fires after the state write and before the checkpoint commit
(the crash-replay contract window — tests/test_stream_crash_replay.py
kills there and asserts losslessness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

STATE_SCHEMA = T.StructType(
    [
        T.StructField("__s", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("r", T.LongType()),
        T.StructField("__batch_id", T.LongType()),
    ]
)


def _batch_counts(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    return (
        df.select(
            F.col(score_col).cast("long").alias("__s"),
            F.when(F.col(label_col).cast("boolean"), 1).otherwise(0).alias("__y"),
        )
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__y").cast("long").alias("r"),
        )
    )


def trend_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Trend z from the merged live state — the batch operator's float
    tree over per-score counts summed across deltas."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

    per = (
        live_state(
            spark, state_path,
            schema="__s long, n long, r long, __batch_id long",
        )
        .groupBy("__s")
        .agg(F.sum("n").cast("long").alias("n"), F.sum("r").cast("long").alias("r"))
    )
    agg = per.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("r").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("k_scores"),
        F.sum(F.col("__s") * F.col("n")).cast("long").alias("__sn"),
        F.sum(F.col("__s") * F.col("r")).cast("long").alias("__sr"),
        F.sum(F.col("__s") * F.col("__s") * F.col("n")).cast("long").alias("__s2n"),
    )
    nd = F.col("n").cast("double")
    rd = F.col("n_pos").cast("double")
    diff = nd * F.col("__sr").cast("double") - rd * F.col("__sn").cast("double")
    den = (
        rd
        * (nd - rd)
        * (
            nd * F.col("__s2n").cast("double")
            - F.col("__sn").cast("double") * F.col("__sn").cast("double")
        )
        / nd
    )
    valid = (
        (F.col("n_pos") > 0)
        & (F.col("n_pos") < F.col("n"))
        & (F.col("k_scores") > 1)
    )
    z = diff / F.sqrt(den)
    return agg.select(
        "n",
        "n_pos",
        "k_scores",
        F.when(valid & (den > 0), z).alias("z_trend"),
        F.when(valid & (den > 0), z * z).alias("z2_trend"),
    )


def stream_trend_drift(
    spark: SparkSession,
    source_path: str,
    source_schema: T.StructType,
    state_path: str,
    checkpoint_dir: str,
    score_col: str = "score",
    label_col: str = "label",
    trigger_once: bool = True,
    compact_threshold: int = 64,
    on_batch=None,
) -> StreamingQuery:
    """Stream (score, label) JSON rows into the per-score count state;
    query the up-to-date dose-response z any time with
    :func:`trend_from_state`."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        compact_state,
        sweep_stale,
    )

    raw = spark.readStream.schema(source_schema).json(source_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sweep_stale(spark, state_path, batch_id)
        if batch_df.isEmpty():
            return
        delta = _batch_counts(batch_df, score_col, label_col).withColumn(
            "__batch_id", F.lit(batch_id).cast("long")
        )
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(state_path)
        )
        compact_state(
            spark, state_path, batch_id,
            key_cols=["__s"],
            aggs=[
                F.sum("n").cast("long").alias("n"),
                F.sum("r").cast("long").alias("r"),
            ],
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
