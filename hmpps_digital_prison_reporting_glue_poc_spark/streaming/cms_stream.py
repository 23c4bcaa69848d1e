"""Streaming Count-Min sketch: continuous heavy-hitter counting over an
unbounded token stream with a fixed-size counter table.

The batch twin (``operators/topk.cms_token_estimates``) sketches a static
corpus; here the depth x width cell table lives in storage and every
micro-batch adds its own cell counts into it — CMS merges by cell-wise
addition, so the merged table after N batches is bit-identical to
sketching the concatenated stream in one pass (pinned by the pytest
parity test). State is depth*width integers forever, independent of
vocabulary growth.

Retry contract: unlike max-merge (HLL), ADDITION IS NOT IDEMPOTENT — a
replayed batch must not double-add. Same discipline as the other
storage-backed streams: cells are written as ``__batch_id`` partitions
with dynamic overwrite, each batch writes only its OWN delta partition,
and readers sum across partitions — a replay overwrites its previous
delta instead of stacking a second one.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def stream_cms_counts(
    spark,
    source_path: str,
    schema,
    cells_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 3,
    trigger_once: bool = True,
    compact_threshold: int = 64,
    on_batch=None,
):
    """Stream documents; per micro-batch, hash the batch's token counts
    into its own CMS delta partition. Query totals with
    :func:`read_cms_estimate`. Delta partitions fold into a base via
    ``state_compact`` once ``compact_threshold`` accumulate, and a stale
    sweep keeps fresh-checkpoint reruns from double-counting."""
    from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        compact_state,
        sweep_stale,
    )

    raw = spark.readStream.schema(schema).json(source_path)

    def apply_batch(batch_df, batch_id: int) -> None:
        # sweep before the empty-batch return: an empty batch 0 on a
        # fresh checkpoint must still clear the dead run's state
        sweep_stale(spark, cells_path, batch_id)
        if batch_df.isEmpty():
            return
        counts = (
            batch_df.select(F.explode(tokens(F.col(text_col))).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        hashed = counts.select(
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
            "token",
        ).withColumn(
            "col",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("d").cast("string"),
                            F.lit(":"),
                            F.col("token"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % width,
        )
        cells = hashed.groupBy("d", "col").agg(
            F.sum("n").cast("long").alias("cell")
        )
        (
            cells.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(cells_path)
        )
        compact_state(
            spark, cells_path, batch_id,
            key_cols=["d", "col"],
            aggs=[F.sum("cell").cast("long").alias("cell")],
            threshold=compact_threshold,
        )
        # crash-window hook: fires after every state write, before the
        # checkpoint commit (tests/test_stream_crash_replay.py raises
        # here to simulate a kill in the at-least-once window)
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


def read_cms_estimate(
    spark, cells_path: str, tokens_df, width: int = 1024, depth: int = 3
):
    """Point-estimate counts for the tokens in ``tokens_df`` (column
    ``token``) from the merged cell table: min over depth rows of the
    summed cells; absent cells count 0. ``width``/``depth`` must match
    the geometry the stream was written with."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

    cells = (
        live_state(
            spark, cells_path,
            schema="d int, col long, cell long, __batch_id long",
        )
        .groupBy("d", "col")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )
    probes = tokens_df.select(
        "token",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).withColumn(
        "col",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"), F.lit(":"), F.col("token")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width,
    )
    return (
        probes.join(cells, ["d", "col"], "left")
        .groupBy("token")
        .agg(
            F.min(F.coalesce(F.col("cell"), F.lit(0)))
            .cast("long")
            .alias("cms_estimate")
        )
    )
