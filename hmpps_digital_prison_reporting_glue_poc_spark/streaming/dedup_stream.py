"""Streaming exact dedup with bounded state.

An at-least-once CDC/event source (the reference's GoldenGate trail files,
a Kinesis replay, a re-run landing job) re-delivers records; the batch
engine dedups with groupBy/dropDuplicates, but a stream cannot hold every
key it has ever seen. ``stream_dedup`` uses Structured Streaming's
``dropDuplicatesWithinWatermark``: the first arrival of a key is emitted,
re-deliveries within the watermark horizon are dropped, and key state older
than the watermark is evicted — so state size tracks the re-delivery window
(hours), not the stream's lifetime (unbounded). That eviction is the
contract: a duplicate arriving later than ``watermark_delay`` after the
original is treated as new; size the delay to the source's maximum
re-delivery lag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    events: DataFrame,
    dedup_keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Emit each key's first arrival; drop re-deliveries that arrive within
    ``watermark_delay``. Keys default to ``["event_id"]``."""
    return events.withWatermark(
        ts_col, watermark_delay
    ).dropDuplicatesWithinWatermark(dedup_keys or ["event_id"])


def stream_ingest_dedup(
    spark,
    source_path: str,
    schema,
    store_path: str,
    corpus_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_threshold: int = 64,
    on_batch=None,
):
    """Continuous corpus growth with dedup-at-ingest: stream incoming
    documents, drop anything whose content fingerprint already exists in
    the persistent store (or earlier in the same batch, lowest id wins),
    append survivors to the corpus and their fingerprints to the store.

    This is the streaming twin of ``dedup.dedup_against_store``: each
    micro-batch costs one anti-join against the store table plus one
    batch-local shuffle — the store is the ONLY state, it lives in
    storage (not executor memory), and it grows by exactly the accepted
    fingerprints, so the operator's state burden at 100 TB is a parquet
    table of (id, fingerprint), not stream-lifetime executor state.

    Retry-safe: foreachBatch is at-least-once, so both sinks are written
    as ``__batch_id`` partitions with dynamic partition overwrite — a
    replayed batch REPLACES its own partitions instead of appending a
    second copy — and the store read excludes the replaying batch's own
    partition so the survivor set is recomputed against the exact
    pre-batch store no matter where the previous attempt died.
    """
    from pyspark.sql import functions as F

    from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
        dedup_against_store,
    )

    raw = spark.readStream.schema(schema).json(source_path)

    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        _partition_ids,
        compact_state,
        live_state,
        sweep_stale,
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        # fresh-checkpoint batch 0 wipes BOTH sinks (a re-segmented replay
        # must not dedup against — or append to — the dead run's output);
        # runs BEFORE the empty-batch early return so an empty batch 0
        # still clears the dead run's state
        sweep_stale(spark, store_path, batch_id)
        sweep_stale(spark, corpus_path, batch_id)
        if batch_df.isEmpty():
            return
        # the sweep may leave the store dir EXISTING but empty (batch-0
        # rerun) — partition listing, not fs.exists, decides readability
        if _partition_ids(spark, store_path):
            # A replay may have committed its fingerprints before the
            # failure; drop the batch's own partition so the recompute
            # sees the exact pre-batch store (live_state applies the
            # compaction coverage rule).
            store = (
                live_state(spark, store_path)
                .filter(F.col("__batch_id") != batch_id)
                .drop("__batch_id")
            )
        else:
            store = spark.createDataFrame([], f"{id_col} long, fingerprint string")
        kept = dedup_against_store(
            batch_df, store, id_col=id_col, text_col=text_col
        ).persist()  # two sinks consume it; compute the anti-join once
        try:
            survivors = batch_df.join(kept.select(id_col), on=id_col)
            for frame, path in (
                (survivors, corpus_path),
                (kept.select(F.col(id_col), "fingerprint"), store_path),
            ):
                (
                    frame.withColumn("__batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__batch_id")
                    .parquet(path)
                )
            # bound store partition count: fold committed fingerprint
            # deltas into a coverage-encoded base (set-union state:
            # distinct rows, no aggregate). The corpus sink is OUTPUT,
            # not state — its layout is left to consumers.
            compact_state(
                spark, store_path, batch_id,
                key_cols=[id_col, "fingerprint"], aggs=[],
                threshold=compact_threshold,
            )
        finally:
            kept.unpersist()
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
