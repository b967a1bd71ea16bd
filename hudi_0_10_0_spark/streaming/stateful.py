"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming of its own (micro-batch
incremental only — SURVEY.md §2.6); this module is the beyond-reference
path for operators Spark's built-in windowed aggregations can't
express: arbitrary per-key state machines with event-time timeouts,
kept in Spark's state store (RocksDB/HDFS-backed at scale, checkpointed
with the query — no external KV store).

``sessionize_stream`` is the canonical example: per-user session
accumulation that EMITS a session only when the inactivity gap expires,
something append-mode window aggregation cannot do for data-driven gaps.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # inactivity gap expired: emit the closed session, clear state
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        # gather event times (µs) from this batch + the open session
        all_ts: list[int] = []
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = None
            n = 0
        for pdf in batches:
            if len(pdf):
                all_ts.extend(pdf["ts"].astype("int64") // 1000)  # ns → µs
        if not all_ts:
            return
        all_ts.sort()
        # split into gap-delimited sessions; the open session absorbs the
        # first run only if it continues it, else it closes immediately
        sessions: list[tuple[int, int, int]] = []
        if start_us is not None:
            cur = [start_us, end_us, n]
        else:
            cur = [all_ts[0], all_ts[0], 0]
        for t in all_ts:
            if t - cur[1] > gap_us:
                sessions.append(tuple(cur))
                cur = [t, t, 1]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
        closed, open_ = sessions, cur
        state.update((open_[0], open_[1], open_[2]))
        # close when event time (watermark) passes session end + gap
        state.setTimeoutTimestamp(open_[1] // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap-sessionization: emits one row per CLOSED session
    (event-time timeout = inactivity gap). Input must be a streaming
    DataFrame with a timestamp column; a watermark of ``gap_seconds``
    drives the timeouts. State per live user is O(1) (start, end,
    count) in the state store."""
    ev = events.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts")
    ).withWatermark("ts", f"{gap_seconds} seconds")
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
