"""Streaming CEP: ordered event-sequence detection with state
(applyInPandasWithState) — the watermark-sealed twin of
``operators/analytics.py::pattern_matches`` (Flink-CEP /
MATCH_RECOGNIZE territory, which Structured Streaming has no built-in
for; per the custom-operator ladder this is exactly the
Pandas-UDF-with-state case).

Correctness under out-of-order arrival: the greedy matcher is
order-SENSITIVE (an early event can start a candidate that a later
event completes), so events may only flow through it in final
event-time order. The state therefore has two parts per key:

- a BUFFER of events the watermark has not passed — the only events a
  late arrival could still interleave with;
- the O(1) matcher state (step index + candidate start) covering
  everything already sealed and scanned.

Each invocation appends new events to the buffer, runs the shared
``_advance_pattern`` over the now-sealed prefix (ts <= watermark) in
(ts, tiebreak) order, emits completed matches, and keeps the rest
buffered. An event-time timeout re-fires the key when the watermark
passes the earliest buffered event, so bars drain without requiring
new traffic for that key. State size = unsealed events only (bounded
by watermark delay x per-key rate) + two scalars — the same bound the
sessionizer carries, and the reason a hot key is safer here than in
the batch op's whole-history group.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from chesscom_etl_tableau_spark.operators.analytics import _advance_pattern

PATTERN_OUT_SCHEMA = (
    "user_id long, match_start timestamp, match_end timestamp, duration_s double"
)
# buffered (ts_us, tiebreak, type) triples + matcher (step_idx, first_us)
PATTERN_STATE_SCHEMA = (
    "buf_us array<long>, buf_id array<long>, buf_type array<string>, "
    "step_idx integer, first_us long"
)


def _pattern_fn_factory(steps: tuple, within_us: int):
    def out_rows(user, matches):
        return pd.DataFrame(
            {
                "user_id": pd.Series([user] * len(matches), dtype="int64"),
                "match_start": pd.Series(
                    [s for s, _ in matches], dtype="int64"
                ).astype("datetime64[us]"),
                "match_end": pd.Series(
                    [e for _, e in matches], dtype="int64"
                ).astype("datetime64[us]"),
                "duration_s": pd.Series(
                    [(e - s) / 1e6 for s, e in matches], dtype="float64"
                ),
            }
        )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        user = key[0]
        if state.exists:
            buf_us, buf_id, buf_type, step_idx, first_us = state.get
            buf = list(zip(buf_us, buf_id, buf_type))
            mstate = (step_idx, first_us)
        else:
            buf, mstate = [], (0, 0)

        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(
                    zip(
                        # vectorized int64-nanos view floor-div'd to µs
                        # (optimization r15, guide §4.2) — exact, no
                        # float round trip, same values as the old
                        # per-row Timestamp.value // 1000
                        (pdf["ts"].astype("int64") // 1000).tolist(),
                        pdf["event_id"].astype("int64").tolist(),
                        pdf["event_type"],
                    )
                )

        wm_us = state.getCurrentWatermarkMs() * 1000
        buf.sort()  # (ts_us, tiebreak, type): final event-time order
        sealed = [(t, ty) for t, i, ty in buf if t <= wm_us]
        kept = [(t, i, ty) for t, i, ty in buf if t > wm_us]
        matches, mstate = _advance_pattern(sealed, steps, within_us, mstate)
        if matches:
            yield out_rows(user, matches)
        if mstate[0] > 0 and wm_us > mstate[1] + within_us:
            # the candidate's budget is behind the watermark: no sealed
            # event can ever advance it — drop it now so an empty-buffer
            # timeout fires once and the state is removed (re-arming at
            # a timestamp <= watermark would be rejected)
            mstate = (0, 0)

        if kept or mstate[0] > 0:
            state.update(
                (
                    [t for t, _, _ in kept],
                    [i for _, i, _ in kept],
                    [ty for _, _, ty in kept],
                    mstate[0],
                    mstate[1],
                )
            )
            if kept:
                # fire again when the watermark passes the earliest
                # buffered event (strictly above the current watermark
                # by construction of `kept`)
                state.setTimeoutTimestamp(min(t for t, _, _ in kept) // 1000 + 1)
            else:
                # only a partial candidate remains; it can never emit
                # without new events, and it expires on its own budget
                # — keep it until then so a resumed stream continues
                # the match, with a timeout at budget end for cleanup
                state.setTimeoutTimestamp((mstate[1] + within_us) // 1000 + 1)
        else:
            state.remove()

    return fn


def streaming_pattern_matches(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "view", "purchase"),
    within_minutes: int = 60,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """events(user_id, event_id, event_type, ts) stream -> one append
    row per completed pattern instance, identical rows to the batch
    `pattern_matches` over the same (fully-arrived) data."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if len(steps) < 2:
        raise ValueError("pattern needs >= 2 steps")
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _pattern_fn_factory(tuple(steps), within_minutes * 60 * 1_000_000),
            outputStructType=PATTERN_OUT_SCHEMA,
            stateStructType=PATTERN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
