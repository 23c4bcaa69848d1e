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


def _make_kernel(gap_minutes: int, idle_timeout_minutes: float | None = None):
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
) -> DataFrame:
    """Sessionize a streaming events frame (user_id, event_id, ts).

    Requires ordered-within-key delivery per micro-batch (sorted inside the
    kernel) and per-key routing (the groupBy shuffle provides it). Returns
    the appended (user_id, event_id, session_idx) stream.

    ``idle_timeout_minutes``: evict a user's state after that much
    processing-time idleness. WITHOUT it, state holds one row per distinct
    user EVER seen — linear growth forever (round-6 streaming stress:
    +1 row per new user, unbounded on a real event stream), which is fine
    for a bounded key space and an OOM on an open one. With it, state is
    bounded by the active-user working set. Semantics of eviction: a user
    returning after eviction restarts at ``session_idx`` 1 — choose a
    timeout >= ``gap_minutes`` so the return would have opened a new
    session anyway, and treat (user, state epoch) as the uniqueness scope
    of the index, the standard trade of every evicting sessionizer.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_minutes is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.select("user_id", "event_id", "ts").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_kernel(gap_minutes, idle_timeout_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
