"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the escape hatch for semantics the
built-in windowed aggregations can't express — here, sessions that
close on inactivity rather than on a fixed grid).

State per user: (session start, last event time, event count). An
incoming micro-batch extends the open session or closes it and opens
a new one; idle sessions are flushed by processing-time timeout. The
batch equivalent (lag + cumulative sum) is ``queries.q_sessionize`` —
same gap semantics, so backfill and live paths agree.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", IntegerType(), True),
    ]
)

_STATE_SCHEMA = "start LONG, last LONG, n INT"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    idle_timeout_ms: int = 60_000,
    timeout: str = "processing",
) -> DataFrame:
    """events (streaming, columns user_col + ts_col) -> closed sessions.

    Emits a row when a gap > ``gap_seconds`` closes a session inside a
    batch, and — with ``timeout='processing'`` (the live-stream mode) —
    flushes the open session when the group sees no data for
    ``idle_timeout_ms`` of processing time, so the stream never holds a
    session open forever. Use ``timeout='none'`` for drain-style
    (``availableNow``) runs: with a processing-time timeout the query
    keeps scheduling batches to service timeouts and never
    self-terminates; with 'none' it stops after the available data and
    open sessions stay in the checkpointed state for the next run.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        closed: list[dict[str, Any]] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append(_row(user, start, last, n))
                state.remove()
            yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())
            return

        start, last, n = state.get if state.exists else (None, None, 0)
        ts_all = (
            pd.concat([p[ts_col] for p in pdfs])
            .sort_values()
            .values.astype("datetime64[us]")
            .astype("int64")  # microseconds since epoch, any pandas unit
        )
        for t in ts_all:  # event times in this batch, ascending
            t = int(t)
            if last is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append(_row(user, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((start, last, n))
            if timeout == "processing":
                state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())

    def _row(user, start, last, n):
        return {
            "user_id": user,
            "session_start": pd.Timestamp(start, unit="us"),
            "session_end": pd.Timestamp(last, unit="us"),
            "n_events": n,
        }

    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout == "processing"
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
