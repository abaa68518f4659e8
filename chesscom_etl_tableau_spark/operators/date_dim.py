"""Calendar dimension (SURVEY.md §1.1 / §2.2 T12 / §2.3 J3).

The reference's BI model auto-generates a `DateTable` with a
Year/Month/Day hierarchy and an auto relationship Games[date_ymd] ->
DateTable[Date]. Here the dimension is generated with
`sequence(min,max,1 day)` + `explode` — covering EVERY day in the span
including zero-activity days (required for correct sparse-date rolling
windows and drill-downs).

Scale note: a century calendar is ~36k rows — always broadcast it;
`join_date_dim` hints this explicitly so the fact side never shuffles.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_date_dim(spark: SparkSession, start: dt.date | str, end: dt.date | str) -> DataFrame:
    """One row per calendar day in [start, end], with hierarchy columns."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(str(start)).cast("date"),
                F.lit(str(end)).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )
    return days.select(
        "date",
        F.year("date").alias("year"),
        F.month("date").alias("month"),
        F.date_format("date", "MMMM").alias("month_name"),
        F.dayofmonth("date").alias("day"),
        F.dayofweek("date").alias("day_of_week"),
        F.quarter("date").alias("quarter"),
    )


def date_dim_for(df: DataFrame, date_col: str) -> DataFrame:
    """Dimension spanning the min..max of `date_col` in `df` (T12).

    The min/max aggregation collapses to a single row before the
    driver-side sequence bounds are needed — expressed fully in the
    plan (scalar subquery via crossJoin of the 1-row agg), no collect.
    """
    bounds = df.agg(
        F.min(F.to_date(F.col(date_col))).alias("d0"),
        F.max(F.to_date(F.col(date_col))).alias("d1"),
    )
    return bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))).alias("date")
    ).select(
        "date",
        F.year("date").alias("year"),
        F.month("date").alias("month"),
        F.date_format("date", "MMMM").alias("month_name"),
        F.dayofmonth("date").alias("day"),
        F.dayofweek("date").alias("day_of_week"),
        F.quarter("date").alias("quarter"),
    )


def join_date_dim(fact: DataFrame, date_dim: DataFrame, fact_date_col: str) -> DataFrame:
    """J3: fact -> calendar equi-join, dimension broadcast."""
    return fact.join(
        F.broadcast(date_dim),
        fact[fact_date_col] == date_dim["date"],
        "left",
    )
