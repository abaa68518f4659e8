"""Time-control classification (SURVEY.md §1.3 / §2.2 T9).

Chess.com time controls come in three textual forms:
  - ``"600"``        : base seconds only
  - ``"300+2"``      : base seconds + per-move increment
  - ``"1/86400"``    : daily correspondence (moves per N seconds)

The bucket thresholds follow chess.com's live-game categories:
bullet < 180s base, blitz < 600s, rapid < 1800s, else classical;
any ``/`` form is daily. Unparseable input buckets to 'unknown'
(the reference stringifies whatever the API returns,
fetch_and_post.py:151, so garbage must not error — we use try_cast,
which also keeps ANSI mode happy).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BULLET_MAX_S = 180
BLITZ_MAX_S = 600
RAPID_MAX_S = 1800


def time_control_base_seconds(tc: Column) -> Column:
    """Base thinking time in seconds; NULL for daily/unparseable forms."""
    return F.when(tc.contains("/"), F.lit(None).cast("int")).otherwise(
        F.split(tc, r"\+").getItem(0).try_cast("int")
    )


def time_control_bucket(tc: Column) -> Column:
    base = time_control_base_seconds(tc)
    return (
        F.when(tc.isNull(), F.lit("unknown"))
        .when(tc.contains("/"), F.lit("daily"))
        .when(base.isNull(), F.lit("unknown"))
        .when(base < BULLET_MAX_S, F.lit("bullet"))
        .when(base < BLITZ_MAX_S, F.lit("blitz"))
        .when(base < RAPID_MAX_S, F.lit("rapid"))
        .otherwise(F.lit("classical"))
    )
