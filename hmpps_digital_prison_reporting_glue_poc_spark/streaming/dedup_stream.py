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
