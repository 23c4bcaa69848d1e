"""Streaming two-sample KS drift monitor (SURVEY.md §2.9 family).

Maintains the exact per-value per-side count state of
``behavior.ks_two_sample`` incrementally: each micro-batch's (quantized
value, side) counts MERGE into a storage-backed state table (counts are
associative — the merged state is bit-identical to a one-pass batch
aggregation over everything seen), and the KS statistic recomputes from
the state after every batch. The state table is value-domain-sized
(distinct grid points), so the per-batch recompute cost is independent
of how much history has streamed through.

Replay safety: state partitions are keyed by ``__batch_id`` under
dynamic partition overwrite — a replayed batch overwrites its own
delta instead of double-adding (the cms_stream.py contract). Because a
FRESH-checkpoint rerun may re-segment the same files into fewer
batches (no maxFilesPerTrigger pinning), each batch additionally
drops any state partition with ``__batch_id >=`` the current id
before writing: within one checkpoint lineage a higher id can only be
stale (Spark replays at most the last uncommitted batch), and on a
fresh checkpoint the batch-0 sweep clears the previous run's state
entirely instead of leaving higher-id partitions to double-count.
Partition-count growth is bounded by ``state_compact.compact_state``
(committed deltas fold into a coverage-encoded base partition), so a
long-running stream holds O(threshold) state directories, not O(batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

STATE_SCHEMA = T.StructType(
    [
        T.StructField("__qv", T.LongType()),
        T.StructField("c1", T.LongType()),
        T.StructField("c2", T.LongType()),
        T.StructField("__batch_id", T.LongType()),
    ]
)


def _batch_counts(df: DataFrame, side_col: str, value_col: str, scale: int) -> DataFrame:
    return (
        df.select(
            F.col(side_col).cast("boolean").alias("__r"),
            F.round(F.col(value_col).cast("double") * scale, 0)
            .cast("long")
            .alias("__qv"),
        )
        # NULL values carry no distribution information and a NULL grid
        # key falls out of the bucket-offset equi-join — same filter as
        # the batch twin ks_two_sample (r10 stream fuzz)
        .filter(F.col("__qv").isNotNull())
        .groupBy("__qv")
        .agg(
            F.sum(F.when(~F.col("__r"), 1).otherwise(0)).cast("long").alias("c1"),
            F.sum(F.when(F.col("__r"), 1).otherwise(0)).cast("long").alias("c2"),
        )
    )


def ks_from_state(
    spark: SparkSession, state_path: str, scale: int = 100
) -> DataFrame:
    """KS statistic from the merged state table — same integer
    cross-product argmax as the batch operator, over per-value counts
    summed across batch deltas."""
    from pyspark.sql import Window

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

    counts = (
        live_state(
            spark, state_path,
            schema="__qv long, c1 long, c2 long, __batch_id long",
        )
        .groupBy("__qv")
        .agg(F.sum("c1").alias("c1"), F.sum("c2").alias("c2"))
    )
    # materialized for the same three-consumer reason as the batch twin
    # (r11): the merged rollup feeds bucket sums, the cumulative join and
    # totals — un-cut, the state store is re-scanned per consumer.
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize

    counts = materialize(counts, "ks_state_counts_")
    keyed = counts.withColumn(
        "__bk", F.floor(F.col("__qv") / F.lit(1024)).cast("long")
    )
    bsums = keyed.groupBy("__bk").agg(
        F.sum("c1").alias("__b1"), F.sum("c2").alias("__b2")
    )
    w_boff = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    boffs = bsums.select(
        "__bk",
        F.coalesce(F.sum("__b1").over(w_boff), F.lit(0)).alias("__o1"),
        F.coalesce(F.sum("__b2").over(w_boff), F.lit(0)).alias("__o2"),
    )
    w_in = Window.partitionBy("__bk").orderBy("__qv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = keyed.join(F.broadcast(boffs), "__bk").select(
        "__qv",
        (F.sum("c1").over(w_in) + F.col("__o1")).alias("f1"),
        (F.sum("c2").over(w_in) + F.col("__o2")).alias("f2"),
    )
    tot = counts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    joined = cum.join(F.broadcast(tot), how="cross")
    d = F.abs(
        F.col("f1").cast("decimal(38,0)") * F.col("n2")
        - F.col("f2").cast("decimal(38,0)") * F.col("n1")
    )
    agg = joined.agg(
        F.max(F.struct(d.alias("__d"), (-F.col("__qv")).alias("__nq"))).alias(
            "__best"
        ),
        F.max("n1").alias("n_left"),
        F.max("n2").alias("n_right"),
    )
    denom = (
        F.col("n_left").cast("decimal(19,0)")
        * F.col("n_right").cast("decimal(19,0)")
    ).cast("double")
    # KS is undefined when either sample is empty — unguarded, the final
    # divide is n1*n2 = 0 and ANSI Spark raises DIVIDE_BY_ZERO; the batch
    # twin ks_two_sample NULLs both stats (r9 fuzz harness), the stream
    # read must match (r10 stream fuzz).
    valid = (F.col("n_left") > 0) & (F.col("n_right") > 0)
    return agg.select(
        "n_left",
        "n_right",
        F.when(valid, F.col("__best.__d").cast("double") / denom).alias(
            "ks_d"
        ),
        F.when(
            valid,
            (-F.col("__best.__nq")).cast("double") / F.lit(float(scale)),
        ).alias("ks_at_value"),
    )


def _counts_from_state(
    spark: SparkSession, state_path: str, prefix: str
) -> DataFrame:
    """The merged live (__qv, c1, c2) count table — the shared input of
    the KS read above and the W1/CvM/energy reads below."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.materialize import materialize
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

    merged = (
        live_state(
            spark, state_path,
            schema="__qv long, c1 long, c2 long, __batch_id long",
        )
        .groupBy("__qv")
        .agg(
            F.sum("c1").cast("long").alias("c1"),
            F.sum("c2").cast("long").alias("c2"),
        )
    )
    # materialized (r11): _grid_from_counts + totals consume this three
    # times; the cut keeps the state store single-scan per read. The
    # prefix is per-statistic so interleaved construction of two reads
    # cannot reap a live reader's dir (r10 advice on the batch twins).
    return materialize(merged, prefix)


def w1_from_state(
    spark: SparkSession, state_path: str, scale: int = 100
) -> DataFrame:
    """Exact Wasserstein-1 drift from the merged state — the same count
    grid the KS read uses feeds ``drift.w1_from_counts``, so one stream
    store serves all four drift functionals (counts are associative:
    the merged state is bit-identical to batch-quantizing everything
    that has streamed through)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import w1_from_counts

    return w1_from_counts(
        _counts_from_state(spark, state_path, "w1_state_counts_"),
        scale=scale,
    )


def cvm_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Two-sample Cramer-von Mises from the merged state (see
    ``w1_from_state``)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import cvm_from_counts

    return cvm_from_counts(
        _counts_from_state(spark, state_path, "cvm_state_counts_")
    )


def energy_from_state(
    spark: SparkSession, state_path: str, scale: int = 100
) -> DataFrame:
    """Energy (Cramer) distance from the merged state (see
    ``w1_from_state``)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import energy_from_counts

    return energy_from_counts(
        _counts_from_state(spark, state_path, "energy_state_counts_"),
        scale=scale,
    )


def ad_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Two-sample Anderson-Darling A2_akN from the merged state (see
    ``w1_from_state``) — the wave-109 tail-sensitive read over the same
    store; one stream store now serves all five drift functionals."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import ad_from_counts

    return ad_from_counts(
        _counts_from_state(spark, state_path, "ad_state_counts_")
    )


def stream_ks_drift(
    spark: SparkSession,
    source_path: str,
    source_schema: T.StructType,
    state_path: str,
    checkpoint_dir: str,
    side_col: str = "is_right",
    value_col: str = "value",
    scale: int = 100,
    on_batch=None,
    trigger_once: bool = True,
    compact_threshold: int = 64,
) -> StreamingQuery:
    """Stream value-bearing JSON rows into the KS count state; after each
    batch the merged state yields the up-to-date drift statistic (fetch it
    with ``ks_from_state``, or observe per-batch via ``on_batch``)."""
    raw = spark.readStream.schema(source_schema).json(source_path)

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        compact_state,
        sweep_stale,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Drop stale partitions a replay makes dead (see module
        # docstring): one FS listing, normally a no-op. Runs BEFORE the
        # empty-batch early return so a fresh-checkpoint rerun whose
        # batch 0 is empty still clears the dead run's state.
        sweep_stale(spark, state_path, batch_id)
        if batch_df.isEmpty():
            return
        delta = _batch_counts(batch_df, side_col, value_col, scale).withColumn(
            "__batch_id", F.lit(batch_id).cast("long")
        )
        # the NULL-value filter can empty a non-empty batch; writing an
        # empty first delta leaves a file-less state dir that parquet
        # schema inference rejects (r10 stream fuzz)
        if delta.isEmpty():
            return
        # Dynamic overwrite MUST be a writer-level option here: foreachBatch
        # hands over a CLONED SparkSession, so setting the session conf on
        # the outer session silently does nothing and mode("overwrite")
        # wipes every prior batch's partition (caught by the round-6
        # streaming stress; the cms_stream writer option was correct).
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(state_path)
        )
        # bound partition-count growth: fold committed deltas into a base
        # partition once more than compact_threshold have accumulated
        compact_state(
            spark, state_path, batch_id,
            key_cols=["__qv"],
            aggs=[
                F.sum("c1").cast("long").alias("c1"),
                F.sum("c2").cast("long").alias("c2"),
            ],
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


def kuiper_from_state(
    spark: SparkSession, state_path: str
) -> DataFrame:
    """Kuiper V = D+ + D- from the merged state (see
    ``w1_from_state``) — the r11 wave-112 statistic over the SAME
    store, so one stream serves all nine grid functionals."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.drift import kuiper_from_counts

    return kuiper_from_counts(
        _counts_from_state(spark, state_path, "kuiper_state_counts_")
    )


def mood_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Mood's squared-rank scale test from the merged state (see
    ``w1_from_state``)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.rankstats import (
        mood_from_counts,
    )

    return mood_from_counts(
        _counts_from_state(spark, state_path, "mood_state_counts_")
    )


def cliffs_from_state(
    spark: SparkSession, state_path: str
) -> DataFrame:
    """Cliff's delta effect size from the merged state (see
    ``w1_from_state``)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.rankstats import (
        cliffs_from_counts,
    )

    return cliffs_from_counts(
        _counts_from_state(spark, state_path, "cliffs_state_counts_")
    )


def cucconi_from_state(
    spark: SparkSession, state_path: str
) -> DataFrame:
    """Cucconi joint location-scale test from the merged state (see
    ``w1_from_state``)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.rankstats import (
        cucconi_from_counts,
    )

    return cucconi_from_counts(
        _counts_from_state(spark, state_path, "cucconi_state_counts_")
    )


def ansari_from_state(
    spark: SparkSession, state_path: str
) -> DataFrame:
    """Ansari-Bradley scale test from the merged state (see
    ``w1_from_state``) — the tenth grid functional served by the one
    ks_stream store (r11 wave 121)."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.rankstats import (
        ansari_from_counts,
    )

    return ansari_from_counts(
        _counts_from_state(spark, state_path, "ansari_state_counts_")
    )
