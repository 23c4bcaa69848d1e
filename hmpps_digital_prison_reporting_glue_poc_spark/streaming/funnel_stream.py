"""Stateful streaming funnel detection (CEP-lite) — match the ordered
stage sequence (e.g. view -> click -> purchase) per user ACROSS
micro-batches, with a conversion window, and emit one row per completed
funnel the moment its final stage arrives.

The batch funnel (``operators/behavior.py funnel_conversion``) answers
"how many users ever completed each stage"; this operator answers the
streaming question — WHICH user completed WHEN, repeatedly (a user who
converts twice emits twice, with ``funnel_idx`` 1, 2, ...). Strict-order
semantics shared with the batch twin: stage N counts only strictly after
stage N-1; single-anchor: progress anchors at the FIRST stage-0 event
and is not re-anchored by later stage-0 events until the funnel
completes or the conversion window expires (the documented batch
convention).

Delivery contract (the sessionize kernel's contract): events arrive in
nondecreasing event order per user across batches (the reference's
GoldenGate ``pos`` discipline); within a batch the kernel sorts by
``event_id``.

State is three scalars per user (stage reached, anchor micros, last
stage micros) + the completion counter — bounded by the active-user
working set under the event-time idle timeout, exactly like
``stream_sessionize``.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("funnel_idx", T.LongType()),
        T.StructField("started_us", T.LongType()),
        T.StructField("completed_us", T.LongType()),
        T.StructField("duration_us", T.LongType()),
    ]
)

# (stage reached, anchor micros, last-stage micros, completions so far)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.LongType()),
        T.StructField("anchor_us", T.LongType()),
        T.StructField("prev_us", T.LongType()),
        T.StructField("n_done", T.LongType()),
    ]
)


def _make_kernel(
    stages: list[str],
    window_hours: float,
    idle_timeout_minutes: float | None,
):
    window_us = int(window_hours * 3_600_000_000)
    k = len(stages)
    timeout_ms = (
        None
        if idle_timeout_minutes is None
        else int(idle_timeout_minutes * 60 * 1000)
    )

    def kernel(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        (user_id,) = key
        stage, anchor_us, prev_us, n_done = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        rows = pd.concat(list(batches), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values("event_id", kind="mergesort")
        out = []
        for etype, ts in zip(rows["event_type"], rows["ts"]):
            ts_us = int(ts.value // 1_000)
            # conversion-window expiry resets progress (the in-flight
            # funnel is abandoned, not completed late)
            if stage > 0 and ts_us - anchor_us > window_us:
                stage, anchor_us, prev_us = 0, 0, 0
            if etype == stages[stage] and (stage == 0 or ts_us > prev_us):
                if stage == 0:
                    anchor_us = ts_us
                prev_us = ts_us
                stage += 1
                if stage == k:
                    n_done += 1
                    out.append(
                        (
                            int(user_id),
                            int(n_done),
                            int(anchor_us),
                            int(ts_us),
                            int(ts_us - anchor_us),
                        )
                    )
                    stage, anchor_us, prev_us = 0, 0, 0
        state.update((int(stage), int(anchor_us), int(prev_us), int(n_done)))
        if timeout_ms is not None:
            last_us = int(rows["ts"].iloc[-1].value // 1_000)
            target_ms = last_us // 1_000 + timeout_ms
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(target_ms, wm + 1))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "funnel_idx",
                    "started_us",
                    "completed_us",
                    "duration_us",
                ],
            )

    return kernel


def stream_funnel_completions(
    events: DataFrame,
    stages: list[str],
    window_hours: float = 72.0,
    idle_timeout_minutes: float | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Emit (user_id, funnel_idx, started_us, completed_us, duration_us)
    for every completed stage sequence. Input needs (user_id, event_id,
    event_type, ts). With ``idle_timeout_minutes`` set, state is evicted
    in EVENT time via the watermark (the sessionize round-7 recipe), so
    a backfill replay produces identical completions to the live run.
    """
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    timeout = GroupStateTimeout.NoTimeout
    if idle_timeout_minutes is not None:
        timeout = GroupStateTimeout.EventTimeTimeout
        events = events.withWatermark("ts", watermark_delay)
    return (
        events.select("user_id", "event_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_kernel(stages, window_hours, idle_timeout_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
