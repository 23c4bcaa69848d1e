"""Stream-stream join with event-time bounds — the enrichment pattern the
reference's Kinesis TODO (README.md:24-25, 54) points at: a live event
stream joined to another live stream, not to a static table.

Structured Streaming buffers BOTH sides in state; without bounds that
state grows forever. Two constraints make it bounded:

1. watermarks on both inputs (how late either side can arrive), and
2. an event-time range in the join condition (how far apart matching
   rows can be).

From those Spark derives when a buffered row can never match again and
evicts it — state tracks the lookback window, not the stream's lifetime.
Inner joins emit as soon as both sides arrive; results are append-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_enrich(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    watermark_delay: str = "30 minutes",
    lookback: str = "1 hour",
) -> DataFrame:
    """Inner-join two streams on ``on`` where the right event happened in
    ``[left_ts - lookback, left_ts]``. Both sides get
    ``watermark_delay`` watermarks; the range bound lets Spark evict
    right-side state older than watermark + lookback."""
    l = left.withWatermark(left_ts, watermark_delay)
    r = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (l[on] == r[on])
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"interval {lookback}"))
    )
    return l.join(r, cond, "inner").drop(r[on])


def stream_enrich_static(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join a live stream against a dimension
    table. The static side is re-read per micro-batch (so slowly-changing
    dims pick up updates) and broadcast — no stream-side state at all,
    which is why this is the default enrichment path and the
    stream-stream join above is reserved for two genuinely live sides."""
    return stream.join(F.broadcast(dim), on=on, how=how)
