"""Stateful streaming sessionization (applyInPandasWithState).

The batch twin is `operators/sessions.py`; this version maintains, per
user, the full set of OPEN candidate sessions — every maximal event run
whose closure the watermark has not yet sealed — and emits a session
exactly once, when the event-time watermark passes `session_end + gap`.

Why a list and not a single open session: with watermark delay W, an
event can arrive up to W late. If W > gap, a late event may

- extend the newest session backwards,
- belong to a *prior* session (t < open.start - gap), or
- BRIDGE two currently-separate sessions into one.

A single-open-session state (the round-2 implementation) silently
merged the "prior session" case into the open one and emitted bridged
sessions early. The watermark criterion is the only safe closure rule:
once wm >= last + gap, any future admitted event has ts > wm >= last +
gap, so it can neither extend the session nor bridge it to a later one
— emission is final, matching the batch twin (which sorts all events
globally) for every event admitted by the watermark.

Semantics: a session is a maximal run of per-user events with
consecutive gaps < `gap`. Closed sessions are emitted exactly once
(append mode); open sessions survive restarts via the checkpoint.

Scale: state per user is three parallel arrays over the open intervals
— O(active sessions) scalars, and more than a handful of entries needs
W >> gap plus pathological arrival order; evicted by the idle flush
(EventTimeTimeout at the earliest open `last + gap`). Throughput is
Arrow-batched per group, no per-row Python round trips.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
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

# State: parallel arrays of open intervals — epoch-second session
# starts, last events, and event counts (sorted by start, pairwise
# gaps >= gap).
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType()), True),
        StructField("lasts", ArrayType(LongType()), True),
        StructField("ns", ArrayType(LongType()), True),
    ]
)


def _session_fn_factory(gap_s: int):
    def close_all(user: str, closed: list):
        # ONE output frame per invocation (optimization r15, guide §4):
        # the old per-session close() built a 1-row pandas DataFrame
        # per emission — tens of thousands of frame constructions per
        # timeout sweep. Vectorized epoch-seconds -> datetime64[s]
        # produces the same naive-UTC instants the per-row
        # datetime.fromtimestamp(...).replace(tzinfo=None) did.
        import numpy as np
        import pandas as pd

        starts = np.array([s for s, _, _ in closed], dtype="int64")
        lasts = np.array([l for _, l, _ in closed], dtype="int64")
        return pd.DataFrame(
            {
                "user_id": np.array([user] * len(closed), dtype=object),
                "session_start": starts.astype("datetime64[s]"),
                "session_end": lasts.astype("datetime64[s]"),
                "n_events": np.array([n for _, _, n in closed], dtype="int64"),
                "duration_s": lasts - starts,
            }
        )

    def fn(key: tuple, pdfs: "Iterator[pd.DataFrame]", state: "GroupState"):
        user = key[0]

        if state.hasTimedOut:
            starts, lasts, ns = state.get
            intervals = sorted(zip(starts, lasts, ns))
        else:
            ts_values: list[int] = []
            for pdf in pdfs:
                # vectorized epoch-seconds (optimization r15, guide
                # §4.2): the int64-nanos view of the Arrow batch divided
                # down, instead of a per-row Timestamp.timestamp() call
                # (pandas treats naive timestamps as UTC in both forms).
                ts_values.extend(
                    (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
                )
            starts, lasts, ns = state.get if state.exists else ([], [], [])
            # New events enter as singleton intervals; one sorted sweep
            # merges everything closer than the gap — including a late
            # event bridging two previously-separate open sessions.
            pending = sorted(
                list(zip(starts, lasts, ns)) + [(t, t, 1) for t in ts_values]
            )
            intervals = []
            for s, l, n in pending:
                if intervals and s - intervals[-1][1] < gap_s:
                    ps, pl, pn = intervals[-1]
                    intervals[-1] = (ps, max(pl, l), pn + n)
                else:
                    intervals.append((s, l, n))

        # Seal every interval the watermark has passed: no admissible
        # future event can extend or bridge it (see module docstring).
        wm_s = state.getCurrentWatermarkMs() // 1000
        closed = [iv for iv in intervals if iv[1] + gap_s <= wm_s]
        kept = [iv for iv in intervals if iv[1] + gap_s > wm_s]
        if closed:
            yield close_all(user, closed)

        if kept:
            state.update(
                (
                    [s for s, _, _ in kept],
                    [l for _, l, _ in kept],
                    [n for _, _, n in kept],
                )
            )
            # Idle flush: wake when the watermark passes the EARLIEST
            # open session's last + gap. kept guarantees last + gap >
            # wm_s, so the timestamp is strictly above the watermark.
            state.setTimeoutTimestamp((min(l for _, l, _ in kept) + gap_s) * 1000)
        else:
            state.remove()

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
