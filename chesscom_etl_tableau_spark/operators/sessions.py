"""Gap-based sessionization (beyond the reference surface; the standard
event-pipeline operator the `events` table calls for).

A session is a maximal run of events per user where consecutive events
are separated by less than `gap`. The batch implementation is two
window functions over one shuffle:

  1. `lag(ts)` per user ordered by event time -> gap to previous event;
  2. running `sum` of the is-new-session flag -> session index.

Both windows share the same (partition, order) spec, so Catalyst
evaluates them in a single Window node over a single sort — no second
shuffle. At 100 TB the only cost is the per-user repartition, which any
per-user analysis needs anyway.

The streaming equivalent with the same semantics is
`streaming/sessionize.py` (applyInPandasWithState).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign `session_seq` (1-based per user) to every event.

    Pass a unique `tiebreak_cols` (e.g. the event id) when timestamps
    can collide — window order must be total for `lag` to be
    deterministic across engines.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col(ts_col).cast("long") - prev_ts.cast("long") >= gap_minutes * 60),
        1,
    ).otherwise(0)
    return events.withColumn("session_seq", F.sum(new_session).over(w))


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per session: bounds, event count, duration seconds."""
    s = sessionize(events, gap_minutes, user_col, ts_col, tiebreak_cols)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long"))).alias(
            "duration_s"
        ),
    )
