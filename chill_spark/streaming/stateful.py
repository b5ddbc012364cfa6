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

    ``timeout='event'`` flushes on EVENT time instead: the caller must
    put a watermark on the stream (``withWatermark(ts_col, ...)``), and
    an open session closes once the watermark passes session_end + gap
    — replay/backfill then produces exactly the same sessions as a live
    run, because no wall-clock enters the semantics (the batch
    equivalent is queries.q_sessionize).
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
            if closed:  # empty yields trip a pandas-concat FutureWarning
                yield pd.DataFrame(
                    closed, columns=SESSION_SCHEMA.fieldNames()
                )
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
            elif timeout == "event":
                # flush when the event-time watermark passes the point
                # at which the gap rule would close this session
                state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)
        if closed:  # empty yields trip a pandas-concat FutureWarning
            yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())

    def _row(user, start, last, n):
        return {
            "user_id": user,
            "session_start": pd.Timestamp(start, unit="us"),
            "session_end": pd.Timestamp(last, unit="us"),
            "n_events": n,
        }

    conf = {
        "processing": GroupStateTimeout.ProcessingTimeTimeout,
        "event": GroupStateTimeout.EventTimeTimeout,
        "none": GroupStateTimeout.NoTimeout,
    }[timeout]
    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 stateful v2) variant
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class SessionProcessor(StatefulProcessor):
    """Gap-sessionizer on the Spark 4 ``StatefulProcessor`` API —
    typed ValueState + optional processing-time timers, the successor
    to applyInPandasWithState's tuple-state/timeout conf. Same
    semantics as ``sessionize_stream`` so either path can serve the
    live side of the batch/stream agreement.

    Requires the RocksDB state store provider (set by
    ``sessionize_stream_v2``) and the protobuf runtime (the v2
    state-server protocol is protobuf-based) — environments without
    ``google.protobuf`` must use ``sessionize_stream`` (v1), which has
    identical semantics. Import of this module stays clean either way.
    """

    def __init__(self, gap_seconds: int, idle_timeout_ms: int | None):
        self.gap_us = gap_seconds * 1_000_000
        self.idle_timeout_ms = idle_timeout_ms

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            IntegerType as _I,
            LongType as _L,
            StructField as _F,
            StructType as _S,
        )

        self.handle = handle
        # seen_ms = processing time of the group's last input batch, so
        # an expired timer can tell a genuinely idle session from one a
        # later batch extended (timers registered in earlier batches
        # keep firing at their original deadline).
        self.state = handle.getValueState(
            "session",
            _S([_F("start", _L()), _F("last", _L()), _F("n", _I()),
                _F("seen_ms", _L())]),
        )

    def _load(self):
        """Current state as a 4-tuple; pads seen_ms=0 when restoring a
        checkpoint written before the schema grew that field (a 0 makes
        the next expired timer treat the session as idle-since-epoch,
        i.e. closable — the pre-seen_ms behavior)."""
        if not self.state.exists():
            return None
        cur = tuple(self.state.get())
        if len(cur) == 3:
            cur = (*cur, 0)
        return cur

    def handleInputRows(self, key, rows, timer_values) -> "Iterator[pd.DataFrame]":
        (user,) = key
        cur = self._load()
        start, last, n, _seen = cur if cur is not None else (None, None, 0, 0)
        closed: list[dict[str, Any]] = []
        ts_all = (
            pd.concat([p["ts"] for p in rows])
            .sort_values()
            .values.astype("datetime64[us]")
            .astype("int64")
        )
        for t in ts_all:
            t = int(t)
            if last is None:
                start, last, n = t, t, 1
            elif t - last > self.gap_us:
                closed.append(_session_row(user, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            now_ms = timer_values.getCurrentProcessingTimeInMs()
            self.state.update((start, last, n, now_ms))
            if self.idle_timeout_ms is not None:
                # one live timer per group: drop deadlines registered by
                # earlier batches (they'd fire early and split an active
                # session), then arm the fresh one.
                for t_old in self.handle.listTimers():
                    self.handle.deleteTimer(t_old)
                self.handle.registerTimer(now_ms + self.idle_timeout_ms)
        yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        (user,) = key
        out = []
        cur = self._load()
        if cur is not None:
            start, last, n, seen_ms = cur
            now_ms = timer_values.getCurrentProcessingTimeInMs()
            idle = self.idle_timeout_ms or 0
            if now_ms - seen_ms >= idle:
                out.append(_session_row(user, start, last, n))
                self.state.clear()
            else:
                # stale deadline (input arrived after it was armed):
                # keep the session and re-arm from last activity.
                self.handle.registerTimer(seen_ms + idle)
        yield pd.DataFrame(out, columns=SESSION_SCHEMA.fieldNames())

    def close(self) -> None:
        pass


def _session_row(user, start, last, n):
    return {
        "user_id": user,
        "session_start": pd.Timestamp(start, unit="us"),
        "session_end": pd.Timestamp(last, unit="us"),
        "n_events": n,
    }


def sessionize_stream_v2(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """``sessionize_stream`` on transformWithStateInPandas.
    ``idle_timeout_ms=None`` -> no timers (drain/availableNow mode);
    set it for live streams to flush idle sessions."""
    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy(user_col).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_seconds, idle_timeout_ms),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime" if idle_timeout_ms is not None else "None",
    )
