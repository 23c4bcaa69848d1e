"""Streaming incremental gram / top-component monitor: accumulate the
EXACT integer gram of an unbounded embedding stream and re-derive the
dominant principal direction on demand — the embedding-collapse monitor
run continuously instead of per-snapshot (`operators/similarity.py
pca_top_component` is the batch twin; both end in the SAME
``power_iteration_top``).

Why this merges exactly: the micro-quantized gram is a SUM of per-row
integer outer products, so per-batch partials add — the merged table
after N batches is bit-identical to the one-pass batch gram (pinned by
the parity test), the same mergeable-state argument as the CMS/HLL
sketches. Addition is not idempotent, so the storage layout is the
CMS retry contract verbatim: each batch writes only its own
``__batch_id`` delta partition with dynamic overwrite (a replayed batch
replaces its previous delta instead of stacking), deltas fold into a
base via ``state_compact``, and a stale sweep clears dead runs on fresh
checkpoints. State is d*(d+1)/2 integers per un-compacted batch —
dimension-bounded, never stream-length-bounded.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _partial_gram_kernel(vec_col: str, d: int):
    def kernel(batches):
        import numpy as np

        acc = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(
                [
                    np.floor(
                        np.asarray(v, dtype=np.float64) * 1_000_000.0
                    ).astype(np.int64)
                    for v in pdf[vec_col]
                ]
            )
            acc += mat.T @ mat
        iu = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": iu[0].astype("int64"),
                "j": iu[1].astype("int64"),
                "s": acc[iu].astype("int64"),
            }
        )

    return kernel


def stream_gram_accumulate(
    spark,
    source_path: str,
    schema,
    gram_path: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    dim: int = 64,
    trigger_once: bool = True,
    compact_threshold: int = 64,
    max_files_per_trigger: int | None = None,
    on_batch=None,
):
    """Stream embedding rows (JSON with a float-array column); per
    micro-batch, write the batch's exact int64 partial gram as its own
    ``__batch_id`` delta partition. Query with
    :func:`read_stream_top_component`."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import (
        compact_state,
        sweep_stale,
    )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(source_path)

    def apply_batch(batch_df, batch_id: int) -> None:
        sweep_stale(spark, gram_path, batch_id)
        if batch_df.isEmpty():
            return
        partial = (
            batch_df.select(vec_col)
            .mapInPandas(
                _partial_gram_kernel(vec_col, dim),
                schema="i long, j long, s long",
            )
            .groupBy("i", "j")
            .agg(F.sum("s").cast("long").alias("s"))
        )
        (
            partial.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(gram_path)
        )
        compact_state(
            spark, gram_path, batch_id,
            key_cols=["i", "j"],
            aggs=[F.sum("s").cast("long").alias("s")],
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


def read_stream_gram(spark, gram_path: str):
    """The merged upper-triangular gram (i, j, g DECIMAL(38,0)) — the
    cell-wise sum across delta partitions, exactly the batch gram."""
    from hmpps_digital_prison_reporting_glue_poc_spark.streaming.state_compact import live_state

    return (
        live_state(
            spark, gram_path,
            schema="i long, j long, s long, __batch_id long",
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("g"))
    )


def read_stream_top_component(
    spark, gram_path: str, dim: int = 64, n_iter: int = 8
):
    """Dominant principal direction of everything streamed so far —
    identical output contract (and, by gram exactness, identical VALUES)
    to the batch ``pca_top_component`` over the concatenated stream."""
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.similarity import (
        power_iteration_top,
    )

    return power_iteration_top(read_stream_gram(spark, gram_path), dim, n_iter)
