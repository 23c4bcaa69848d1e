"""Structured Streaming CDC apply (SURVEY.md §2.9 — aspirational in the
reference, real here).

The reference's batch merge is re-expressed as ``readStream`` over the CDC
event source + ``foreachBatch`` incremental merge: each micro-batch runs the
same window fold (last event per key within the batch) and hands the net
upsert/delete frame to the merge sink — Delta ``MERGE INTO`` when available,
the parquet logical merge otherwise. This is exactly the micro-batch design
the reference's README lists as TODO (reference README.md:24-25, Kinesis
trigger stubs at src/apply_change_log_to_delta.py:521-528).

Ordering: within a batch, the GoldenGate ``pos`` total order decides the
fold (reference semantics); across batches the source must deliver
per-key-ordered data (true for a trail-file reader or a Kinesis shard keyed
by table+pk). An ``op_ts`` watermark bounds state for any windowed
downstream aggregation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from hmpps_digital_prison_reporting_glue_poc_spark.operators.cdc import (
    cdc_upsert_frame,
    ingest_events,
    map_events_to_target,
)
from hmpps_digital_prison_reporting_glue_poc_spark.sources.io import (
    cdc_envelope_schema,
    merge_write,
)


def stream_cdc_to_table(
    spark: SparkSession,
    source_path: str,
    row_schema: T.StructType,
    target_schema: T.StructType,
    target_path: str,
    pk: list[str],
    checkpoint_dir: str,
    trigger_once: bool = True,
    on_batch: Callable[[DataFrame, int], None] | None = None,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Stream raw CDC JSON into an incrementally-merged target table.

    ``trigger_once`` runs one availableNow micro-batch (test/backfill mode);
    continuous mode just drops the flag.

    ``partition_by``: passed through to the merge sink. Without it the
    parquet-fallback merge REWRITES THE WHOLE TARGET each micro-batch —
    per-batch cost grows with the accumulated table, i.e. quadratic total
    work over a day of minute-batches (measured in SCALE.md round-6
    streaming stress). Any continuously-merging deployment should give
    the target a partition column so each batch rewrites only touched
    partitions.
    """
    raw = (
        spark.readStream.schema(cdc_envelope_schema(row_schema))
        .json(source_path)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        events = ingest_events(batch_df)
        mapped = map_events_to_target(events, target_schema)
        net = cdc_upsert_frame(mapped, pk)
        updates = net.select(
            *[f.name for f in target_schema.fields], "__is_delete"
        )
        merge_write(
            spark, updates, target_path, pk, delete_col="__is_delete",
            partition_by=partition_by,
        )
        if on_batch is not None:
            on_batch(batch_df, batch_id)

    writer = (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
