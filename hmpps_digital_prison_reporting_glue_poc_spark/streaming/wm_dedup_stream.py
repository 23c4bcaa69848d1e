"""Watermark-bounded streaming deduplication — the built-in
``dropDuplicatesWithinWatermark`` surface (Spark 3.5+), complementing the
storage-backed ``dedup_stream`` (exact-forever fingerprint store):

- ``dedup_stream``: duplicates are dropped FOREVER (state = compacted
  fingerprint store, grows with distinct keys, compaction-bounded files).
- this module: duplicates are dropped within the WATERMARK horizon only —
  state is evicted once the watermark passes a key's last-seen event
  time, so memory is bounded by the horizon's key working set and a key
  recurring after the horizon is admitted again. That contract is
  exactly right for at-least-once ingest retries (the duplicate arrives
  seconds later, not days) and wrong for crawl-recrawl dedup — pick by
  contract, both exist.

Semantics pinned by pytest: a duplicate arriving in a LATER micro-batch
within the horizon is dropped; the same key re-arriving with an event
time after the watermark passed its first occurrence is re-emitted
(state was evicted).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def stream_dedup_within_watermark(
    spark,
    source_path: str,
    schema,
    out_path: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "30 minutes",
    trigger_once: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Stream JSON rows from ``source_path``, drop duplicate ``key_cols``
    tuples within the watermark horizon, append survivors to
    ``out_path``."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(source_path)
    if dict(raw.dtypes).get(ts_col) == "string":
        raw = raw.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    deduped = raw.withWatermark(
        ts_col, watermark_delay
    ).dropDuplicatesWithinWatermark(list(key_cols))
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
