"""Stateful streaming sessionization — the custom-stateful-operator pattern
(applyInPandasWithState) the reference's streaming ambitions point at
(SURVEY.md §2.9): per-key state carried across micro-batches, Arrow-batched
Python kernel, watermark-bounded.

Semantics match the batch twin (``__spark_entry__.sessionize_events``): a
gap greater than ``gap_minutes`` between consecutive events of a user
starts a new session; session indices are 1-based and strictly increasing
per user — and, unlike the batch windowed form, the state (last event time,
current session index) survives micro-batch boundaries, so an unbounded
stream gets correct sessions with bounded memory.
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


def _make_kernel(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def kernel(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
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
        yield pd.DataFrame(
            {
                "user_id": int(user_id),
                "event_id": out_ids,
                "session_idx": out_sessions,
            }
        )

    return kernel


def stream_sessionize(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Sessionize a streaming events frame (user_id, event_id, ts).

    Requires ordered-within-key delivery per micro-batch (sorted inside the
    kernel) and per-key routing (the groupBy shuffle provides it). Returns
    the appended (user_id, event_id, session_idx) stream.
    """
    return events.select("user_id", "event_id", "ts").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_kernel(gap_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
