"""Streaming NEAR-duplicate dedup-at-ingest (MinHash + banded LSH).

``stream_ingest_dedup`` gates on exact content fingerprints; real ingest
pipelines also have to stop *near*-duplicates (reformatted re-crawls,
boilerplate-shifted copies) at the gate. This is the streaming twin of
``dedup.neardup_against_store``: the persistent state is the accepted
corpus's LSH BAND table — (doc_id, band_idx, band_key), a handful of rows
per accepted document — and each micro-batch costs one shingle→minhash
aggregation over the batch plus one INVERTED probe join against the
store: the batch's band table (bounded by trigger size) broadcasts and
the store streams through a BroadcastHashJoin, so the store is never
shuffled or sorted per batch — its per-batch cost is one partition-local
scan (r10 verdict task 6; the direct ``bands left_semi store`` shape
could only broadcast the STORE side, falling back to re-shuffling the
whole store every batch at corpus scale). No all-pairs comparison
anywhere; at 100 TB the band store is a parquet table linear in the
accepted corpus, living in storage rather than executor memory.

Storage discipline is the ``bloom_stream``/``dedup_stream`` contract:
both sinks are written as ``__batch_id`` partitions with dynamic
partition overwrite (an at-least-once replay REPLACES its own output),
the store read excludes the replaying batch's own partition so the
survivor set is recomputed against the exact pre-batch store, batch-0
``sweep_stale`` clears a dead run's state, and committed deltas fold into
a coverage-encoded base via ``compact_state``. The ``on_batch`` hook
fires after the state write and before the checkpoint commit — the
crash window ``tests/test_stream_crash_replay.py`` kills in (twice for
batch 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def stream_neardup_ingest(
    spark,
    source_path: str,
    schema,
    store_path: str,
    corpus_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    compact_threshold: int = 64,
    on_batch=None,
):
    """Stream documents from ``source_path``; per micro-batch, keep only
    documents that near-dup neither the accepted corpus (band match
    against the store) nor a smaller-id batch-mate (keep-first closure —
    see ``dedup.neardup_against_store`` for the exact survivor contract).
    Survivors' documents append to ``corpus_path`` and their band rows to
    ``store_path``; both as replay-safe ``__batch_id`` partitions.
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.dedup import (
        neardup_against_store,
    )
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        _partition_ids,
        compact_state,
        live_state,
        sweep_stale,
    )

    raw = spark.readStream.schema(schema).json(source_path)

    def apply_batch(batch_df, batch_id: int) -> None:
        # fresh-checkpoint batch 0 wipes BOTH sinks before the empty-batch
        # early return (an empty batch 0 must still clear a dead run)
        sweep_stale(spark, store_path, batch_id)
        sweep_stale(spark, corpus_path, batch_id)
        if batch_df.isEmpty():
            return
        if _partition_ids(spark, store_path):
            # a replay may have committed its bands before the failure;
            # drop the batch's own partition so the recompute sees the
            # exact pre-batch store
            store = (
                live_state(spark, store_path)
                .filter(F.col("__batch_id") != batch_id)
                .drop("__batch_id")
            )
        else:
            store = spark.createDataFrame(
                [], f"{id_col} long, band_idx int, band_key string"
            )
        kept = neardup_against_store(
            batch_df,
            store,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
            shingle_k=shingle_k,
            # the micro-batch's band table is bounded by trigger size:
            # broadcast it and STREAM the store through the probe join —
            # zero store-side Exchange/sort per batch, vs re-shuffling
            # the whole accepted-corpus store every batch (r10 verdict
            # task 6; plan asserted in tests/test_stream_neardup.py)
            broadcast_incoming=True,
        ).persist()  # two sinks consume it; compute the gate once
        try:
            survivors = batch_df.join(
                kept.select(id_col).distinct(), on=id_col
            )
            for frame, path in ((survivors, corpus_path), (kept, store_path)):
                (
                    frame.withColumn("__batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__batch_id")
                    .parquet(path)
                )
            # band rows are set-union state: distinct rows, no aggregate
            compact_state(
                spark, store_path, batch_id,
                key_cols=[id_col, "band_idx", "band_key"], aggs=[],
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
