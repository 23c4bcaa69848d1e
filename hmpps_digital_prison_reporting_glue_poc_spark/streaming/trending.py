"""Streaming trending-terms: watermarked windowed token counts ranked to
top-k per finalized window — the "what is spiking right now" feed of a
content pipeline.

Shape: explode tokens -> event-time tumbling window + watermark ->
streaming count aggregation (state bounded by the watermark horizon) ->
``foreachBatch`` ranks each batch of FINALIZED windows (append mode emits
a window exactly once, after the watermark passes its end) and appends the
top-k rows to the sink. Ranking happens per closed window on the
window's own count table — vocabulary-sized, not corpus-sized — so the
rank window never sees the stream itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import tokens


def windowed_token_counts(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked per-window token counts (streaming-safe aggregation).
    Returns (window_start, window_end, token, n_occurrences)."""
    toks = docs.withWatermark(ts_col, watermark_delay).select(
        F.col(ts_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    agg = toks.groupBy(
        F.window(F.col(ts_col), window_duration).alias("__w"), "token"
    ).agg(F.count(F.lit(1)).alias("n_occurrences"))
    return agg.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        "token",
        "n_occurrences",
    )


def rank_topk_per_window(counts: DataFrame, k: int = 5) -> DataFrame:
    """Batch ranking of a (window, token, count) table: top-k by
    (count desc, token asc) within each window — total-ordered, so results
    are deterministic under ties."""
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def stream_trending_tokens(
    spark,
    source_path: str,
    schema,
    out_path: str,
    checkpoint_dir: str,
    k: int = 5,
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
    trigger_once: bool = True,
    max_files_per_trigger: int | None = None,
):
    """End-to-end: stream JSON docs, maintain watermarked windowed token
    counts, and append the top-k of every finalized window to ``out_path``.
    Append mode guarantees each window is ranked exactly once, from its
    final counts. ``max_files_per_trigger`` caps each micro-batch's file
    intake (stress harness: one source file per batch)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(source_path)
    if dict(raw.dtypes).get(ts_col) == "string":
        raw = raw.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    counts = windowed_token_counts(
        raw, ts_col, text_col, window_duration, watermark_delay
    )

    def rank_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rank_topk_per_window(batch_df, k=k).write.mode("append").parquet(
            out_path
        )

    writer = (
        counts.writeStream.foreachBatch(rank_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
