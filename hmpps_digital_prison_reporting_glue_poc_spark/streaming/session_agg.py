"""Native session-window streaming aggregation — Spark's built-in
``session_window`` (gap-merged event-time sessions) under a watermark,
the ENGINE-MANAGED alternative to the two hand-rolled sessionizers:

- ``streaming/sessionize.py`` (applyInPandasWithState): custom per-event
  session LABELS with explicit timeout control — use when each event
  needs its session id attached.
- this module: session-grain AGGREGATES (count/sum per session) with no
  Python state code at all — the engine merges gap-adjacent windows,
  bounds state by the watermark, and in append mode emits each session
  exactly once, when the watermark passes ``last_event + gap`` (sessions
  are final, never retracted).

Semantics pinned by the batch twin (`__spark_entry__.session_window_stats`
oracle + pytest): a silence of EXACTLY the gap merges; strictly greater
splits; session end = last event time + gap.

Rebuilt from the reference's aspirational streaming surface (SURVEY.md
§2.9); the reference's batch CDC had no session concept at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_aggregates(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Session-grain rollup of a streaming event frame: one row per
    (user, merged session) with event count and integer-cents value sum.

    State design for an unbounded stream: session state lives only
    until the watermark passes the session's end — a user who goes
    quiet costs nothing after ``gap + watermark_delay``; there is no
    keys-ever-seen growth (the wm_dedup contract, not the fingerprint-
    store contract). Returns
    (user, session_start, session_end, n_events, cents).
    """
    agg = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.round(F.col(value_col).cast("double") * 100, 0).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("cents"),
        )
    )
    return agg.select(
        F.col(user_col),
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "cents",
    )
