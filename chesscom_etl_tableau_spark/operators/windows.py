"""Rolling event-time windows (SURVEY.md §2.5 W1: Rolling12Days_WinRate).

The reference's line chart shows a trailing 12-day win rate per day
(DAX DATESINPERIOD-style). The scale-correct Spark shape is:

  1. pre-aggregate the fact table to one row per (partition, day) —
     this is the only full-data shuffle, with map-side combine, and it
     collapses ~1e12 rows to ~1e4 days per partition key;
  2. apply a RANGE frame over the integer epoch-day of the *pre-
     aggregated* rows: ``rangeBetween(-(days-1), 0)``.

RANGE (not ROWS) is load-bearing: event days can be sparse, and a
rows-frame would silently reach back further than `days` calendar days
(SURVEY.md §7 risk 1). The ratio-of-sums form (sum wins / sum games
over the frame) matches a ratio measure re-evaluated per day, not an
average of daily ratios.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_ratio_by_day(
    df: DataFrame,
    date_col: str,
    num_cond: Column,
    days: int = 12,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-day trailing `days`-day ratio: sum(num_cond) / count(*).

    Returns one row per (partition_cols..., day) with columns
    `day, day_num, day_den, roll_num, roll_den, roll_ratio`.
    """
    daily = df.groupBy(
        *partition_cols, F.to_date(F.col(date_col)).alias("day")
    ).agg(
        F.count_if(num_cond).alias("day_num"),
        F.count(F.lit(1)).alias("day_den"),
    )
    daily = daily.withColumn("epoch_day", F.datediff(F.col("day"), F.lit("1970-01-01")))
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        .orderBy("epoch_day")
        .rangeBetween(-(days - 1), 0)
    )
    return (
        daily.withColumn("roll_num", F.sum("day_num").over(w))
        .withColumn("roll_den", F.sum("day_den").over(w))
        .withColumn("roll_ratio", F.round(F.try_divide(F.col("roll_num"), F.col("roll_den")), 6))
        .drop("epoch_day")
    )
