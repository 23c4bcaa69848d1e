"""Stateful streaming sessionization — the custom-stateful-operator pattern
(applyInPandasWithState) the reference's streaming ambitions point at
(SURVEY.md §2.9): per-key state carried across micro-batches, Arrow-batched
Python kernel, watermark-bounded.

Semantics match the batch twin (``__spark_entry__.sessionize_events``): a
gap greater than ``gap_minutes`` between consecutive events of a user
starts a new session; session indices are 1-based and strictly increasing
per user — and, unlike the batch windowed form, the state (last event time,
current session index) survives micro-batch boundaries, so an unbounded
stream gets correct sessions — with memory bounded by the active-user
working set when ``idle_timeout_minutes`` is set (without it, one state
row per distinct user ever seen).

Timeout clock (round-7): eviction defaults to EVENT time. Processing-time
eviction is wall-clock: a backfill replaying history at full speed never
lets a user sit idle, so sessions that were idle-split live are silently
MERGED on replay — replay and live runs disagree. Event-time eviction is
driven by the data's own timestamps through the watermark, so a replay is
bit-identical to the paced original. Processing-time remains an option for
genuinely wall-clock-bounded state (e.g. a cache-eviction monitor).
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
        T.StructField("event_id", T.LongType()),
        T.StructField("session_idx", T.LongType()),
    ]
)

# (last event micros, current session index)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("session_idx", T.LongType()),
    ]
)


def _make_kernel(
    gap_minutes: int,
    idle_timeout_minutes: float | None = None,
    timeout_mode: str = "event",
):
    gap_us = gap_minutes * 60 * 1_000_000
    timeout_ms = (
        None if idle_timeout_minutes is None
        else int(idle_timeout_minutes * 60 * 1000)
    )

    def kernel(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if timeout_ms is not None and state.hasTimedOut:
            state.remove()  # idle user: evict, nothing to emit
            return
        (user_id,) = key
        last_us, session_idx = state.get if state.exists else (None, 0)
        rows = pd.concat(list(batches), ignore_index=True)
        if rows.empty:
            return
        # Events fold in event_id order (the CDC 'pos' discipline).
        rows = rows.sort_values("event_id", kind="mergesort")
        out_ids, out_sessions = [], []
        for event_id, ts in zip(rows["event_id"], rows["ts"]):
            ts_us = int(ts.value // 1_000)  # pandas ns -> micros
            if last_us is None or ts_us - last_us > gap_us:
                session_idx += 1
            last_us = ts_us
            out_ids.append(int(event_id))
            out_sessions.append(int(session_idx))
        state.update((last_us, session_idx))
        if timeout_ms is not None:
            if timeout_mode == "event":
                # evict when the WATERMARK (data time, not wall clock)
                # passes last-event + idle window; Spark requires the
                # target to be above the current watermark
                target_ms = last_us // 1_000 + timeout_ms
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(target_ms, wm + 1))
            else:
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": int(user_id),
                "event_id": out_ids,
                "session_idx": out_sessions,
            }
        )

    return kernel


def stream_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    idle_timeout_minutes: float | None = None,
    timeout_mode: str = "event",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Sessionize a streaming events frame (user_id, event_id, ts).

    Requires ordered-within-key delivery per micro-batch (sorted inside the
    kernel) and per-key routing (the groupBy shuffle provides it). Returns
    the appended (user_id, event_id, session_idx) stream.

    ``idle_timeout_minutes``: evict a user's state after that much
    idleness. WITHOUT it, state holds one row per distinct user EVER seen —
    linear growth forever (round-6 streaming stress: +1 row per new user,
    unbounded on a real event stream), which is fine for a bounded key
    space and an OOM on an open one. With it, state is bounded by the
    active-user working set. Semantics of eviction: a user returning after
    eviction restarts at ``session_idx`` 1 — choose a timeout >=
    ``gap_minutes`` so the return would have opened a new session anyway,
    and treat (user, state epoch) as the uniqueness scope of the index,
    the standard trade of every evicting sessionizer.

    ``timeout_mode`` (round-7): ``"event"`` (default) measures idleness in
    EVENT time via ``EventTimeTimeout`` — a watermark (``watermark_delay``
    behind max event time) is applied to ``ts`` and a user is evicted when
    the watermark passes their last event + idle window. A full-speed
    backfill replay then produces sessions IDENTICAL to the live-paced
    original (pytest-pinned). ``"processing"`` keeps the wall-clock
    ``ProcessingTimeTimeout`` behavior — idleness on the serving clock,
    replay-divergent by construction. Ignored when
    ``idle_timeout_minutes`` is None.
    """
    if timeout_mode not in ("event", "processing"):
        raise ValueError(
            f"timeout_mode must be 'event' or 'processing', got {timeout_mode!r}"
        )
    if idle_timeout_minutes is None:
        timeout = GroupStateTimeout.NoTimeout
    elif timeout_mode == "event":
        timeout = GroupStateTimeout.EventTimeTimeout
        events = events.withWatermark("ts", watermark_delay)
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return events.select("user_id", "event_id", "ts").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_kernel(gap_minutes, idle_timeout_minutes, timeout_mode),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
