"""Custom stateful streaming operator: event sessionization with
``applyInPandasWithState`` (the C20 window semantics, incrementally).

Batch sessionization (``events_sessionized``) numbers sessions with a
window over the full history; a stream can't see the full history, so the
stateful form keeps per-user state (current session start/last ts,
aggregates) and EMITS a session row when the event-time watermark passes
its 30-minute inactivity gap (EventTimeTimeout).  Output rows therefore
match the batch operator for every CLOSED session — the parity test closes
all sessions by appending a far-future sentinel event per user.

State size is O(active users), the watermark bounds it, and grouping by
user_id gives the same shuffle as the batch window — the standard scale
shape for streaming sessionization.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, n_events long, "
                  "session_value double")
_STATE_SCHEMA = "start long, last long, n long, value double"

GAP_SEC = 1800


def _sessionize_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out: list[tuple[Any, ...]] = []

    if state.hasTimedOut:
        start, last, n, value = state.get
        out.append((user_id, start, n, value))
        state.remove()
    else:
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts")
        ts_sec = rows["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        if state.exists:
            start, last, n, value = state.get
        else:
            start, last, n, value = None, None, 0, 0.0
        for t, v in zip(ts_sec, rows["value"]):
            t = int(t)
            if last is not None and t - last > GAP_SEC:
                out.append((user_id, start, n, value))
                start, n, value = t, 0, 0.0
            if start is None:
                start = t
            n += 1
            value += float(v)
            last = t
        state.update((start, last, n, value))
        # close the session once the watermark passes last_ts + gap
        state.setTimeoutTimestamp((last + GAP_SEC) * 1000)

    if out:
        yield pd.DataFrame(
            [(u, pd.Timestamp(s, unit="s"), n, round(v, 2))
             for (u, s, n, v) in out],
            columns=["user_id", "session_start", "n_events", "session_value"],
        )


def sessionize_stream(events: DataFrame, watermark: str = "30 minutes"
                      ) -> DataFrame:
    """events stream (user_id, ts, value) → closed-session rows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
