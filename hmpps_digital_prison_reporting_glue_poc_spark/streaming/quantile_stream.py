"""Streaming quantile monitor (the quantile member of the storage-backed
mergeable-sketch family, beside HLL / CMS / Misra-Gries).

Each micro-batch quantizes its values onto the fixed grid
(``operators/topk.grid_quantile_state``) and writes its per-grid-point
counts as its own ``__batch_id`` delta partition (dynamic overwrite —
replay-safe, the cms_stream contract), with the shared stale-attempt /
fresh-checkpoint sweep and ``state_compact`` folding committed deltas
into a coverage-encoded base. Readers sum the live state and extract
exact type-1 quantiles of the quantized multiset — error bounded by the
grid pitch 1/scale by construction, state bounded by occupied grid
points, per-batch cost independent of stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from hmpps_digital_prison_reporting_glue_poc_spark.operators.topk import (
    grid_quantile_state,
    grid_quantiles,
)
from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
    compact_state,
    live_state,
    sweep_stale,
)


def stream_quantile_counts(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    state_path: str,
    checkpoint_dir: str,
    value_col: str = "value",
    scale: int = 100,
    trigger_once: bool = True,
    compact_threshold: int = 64,
    on_batch=None,
) -> StreamingQuery:
    """Stream value-bearing JSON rows into the grid-count state; query
    quantiles any time with :func:`quantiles_from_state`."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # sweep before the empty-batch return: an empty batch 0 on a
        # fresh checkpoint must still clear the dead run's state
        sweep_stale(spark, state_path, batch_id)
        if batch_df.isEmpty():
            return
        delta = grid_quantile_state(batch_df, value_col, scale).withColumn(
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
            key_cols=["__qv"],
            aggs=[F.sum("n").cast("long").alias("n")],
            threshold=compact_threshold,
        )
        # crash-window hook (see tests/test_stream_crash_replay.py)
        if on_batch is not None:
            on_batch(batch_id)

    raw = spark.readStream.schema(schema).json(source_path)
    writer = (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def quantiles_from_state(
    spark: SparkSession,
    state_path: str,
    quantiles: list[float],
    scale: int = 100,
) -> DataFrame:
    """Quantiles from the merged live state — identical to the batch
    operator over everything that has streamed through (count merge is
    associative; pinned by the batch/stream parity pytest)."""
    return grid_quantiles(
        live_state(
            spark, state_path,
            schema="__qv long, n long, __batch_id long",
        ),
        quantiles,
        scale=scale,
    )
