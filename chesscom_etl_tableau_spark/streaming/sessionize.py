"""Stateful streaming sessionization (applyInPandasWithState).

The batch twin is `operators/sessions.py`; this version maintains one
open session per user in the state store and closes it either when a
later event arrives past the gap, or when the event-time watermark
passes `last_seen + gap` (idle flush via EventTimeTimeout).

Semantics match the batch operator: a session is a maximal run of
per-user events with consecutive gaps < `gap`. Closed sessions are
emitted exactly once (append mode); the open tail session stays in
state and survives restarts via the checkpoint.

Scale: state per user is three scalars (start, last, n) — O(active
users) bytes, evicted on idle flush; throughput is Arrow-batched per
group, no per-row Python round trips.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType(), True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
        StructField("duration_s", LongType(), True),
    ]
)

# State: epoch-second session start, last event, event count.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType(), True),
        StructField("last", LongType(), True),
        StructField("n", LongType(), True),
    ]
)


def _session_fn_factory(gap_s: int):
    def close(user: str, start: int, last: int, n: int):
        import datetime as dt

        import pandas as pd

        utc = dt.timezone.utc
        return pd.DataFrame(
            {
                "user_id": [user],
                "session_start": [dt.datetime.fromtimestamp(start, tz=utc).replace(tzinfo=None)],
                "session_end": [dt.datetime.fromtimestamp(last, tz=utc).replace(tzinfo=None)],
                "n_events": [n],
                "duration_s": [last - start],
            }
        )

    def fn(key: tuple, pdfs: "Iterator[pd.DataFrame]", state: "GroupState"):
        user = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield close(user, start, last, n)
            return

        ts_values: list[int] = []
        for pdf in pdfs:
            ts_values.extend(int(v.timestamp()) for v in pdf["ts"])
        ts_values.sort()

        start, last, n = state.get if state.exists else (None, None, 0)
        for t in ts_values:
            if start is None:
                start, last, n = t, t, 1
            elif t - last >= gap_s:
                yield close(user, start, last, n)
                start, last, n = t, t, 1
            else:
                # A late event inside the watermark may sort before the
                # open session's tail (or even its start): merging must
                # never move the session window backwards, or the idle
                # flush fires early and duration shrinks vs the batch
                # twin, which sorts all events globally.
                start, last, n = min(start, t), max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
            # Idle flush: close the open session when the watermark
            # passes last + gap (milliseconds).
            state.setTimeoutTimestamp((last + gap_s) * 1000)

    return fn


def streaming_session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """events(user_id, ts) stream -> closed-session rows (append mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn_factory(gap_minutes * 60),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
