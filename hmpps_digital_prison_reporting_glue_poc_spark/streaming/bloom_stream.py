"""Streaming Bloom-filter decontamination: flag incoming documents whose
n-grams hit an evaluation-set Bloom filter, as they arrive.

The batch twin (``operators/retrieval.py``) probes a static corpus; here
the filter's set-bit table lives in storage and every micro-batch probes
against it — the shape a continuous ingest pipeline uses to keep
benchmark-contaminated documents out of a growing training corpus. The
filter is the ONLY state (<= m_bits rows of one int, kilobytes — it
broadcasts into every batch), and verdicts are written as
``__batch_id`` partitions with dynamic overwrite so at-least-once
foreachBatch replays replace their own output instead of duplicating it
(same retry contract as ``stream_ingest_dedup``).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def stream_bloom_decontaminate(
    spark,
    source_path: str,
    schema,
    filter_bits_path: str,
    verdicts_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
    m_bits: int = 4096,
    k_hashes: int = 3,
):
    """Stream documents from ``source_path``; per micro-batch, probe each
    document's distinct n-grams against the Bloom set-bit table stored at
    ``filter_bits_path`` and append per-document contamination verdicts
    (n_grams, n_flagged, flagged_share) to ``verdicts_path``.

    Documents with no n-grams (shorter than ``ngram_n`` tokens) emit no
    verdict row, matching the batch operator exactly — the pytest
    batch/stream parity test pins that equivalence.
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.retrieval import (
        bloom_probe_docs,
    )

    raw = spark.readStream.schema(schema).json(source_path)

    def apply_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bits = spark.read.parquet(filter_bits_path)
        verdicts = bloom_probe_docs(
            batch_df,
            bits,
            id_col=id_col,
            text_col=text_col,
            ngram_n=ngram_n,
            m_bits=m_bits,
            k_hashes=k_hashes,
        )
        (
            verdicts.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(verdicts_path)
        )

    writer = (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
