"""Watermarked event-time windowed aggregation — the late-data handling the
reference lacked (SURVEY.md §2.9: it relied on total ordering by GoldenGate
``pos`` instead of watermarks).

``stream_windowed_counts`` is the standard Structured Streaming shape:
event-time tumbling windows + a watermark that (a) bounds state — window
state older than the watermark is evicted, so an unbounded stream runs in
bounded memory — and (b) defines the lateness contract: events arriving
later than ``watermark_delay`` behind the max seen event time are dropped.
In append mode a window only emits once the watermark passes its end, i.e.
results are final, never retracted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_windowed_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Windowed counts + value sum per (window, *keys) with a watermark.

    Returns (window_start, window_end, *keys, n_events, sum_value).
    """
    group_cols = [F.window(F.col(ts_col), window_duration).alias("__w")] + [
        F.col(k) for k in (keys or [])
    ]
    agg = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    return agg.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[F.col(k) for k in (keys or [])],
        "n_events",
        "sum_value",
    )
