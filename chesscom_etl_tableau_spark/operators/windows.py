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


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha_pct: int = 30,
    horizon: int = 8,
) -> DataFrame:
    """Finite-horizon exponentially-weighted moving average per key —
    the smoothing step of streaming anomaly detection, as a single
    window pass.

    s_i = α · Σ_{k=0..h-1} (1-α)^k · x_{i-k}, truncated at `horizon`
    terms (relative truncation error ≤ (1-α)^h — 5.7% of the oldest
    in-window weight at α=0.3, h=8). The truncation is what makes the
    operator engine-exact AND scale-sane: the exact recurrence
    s_i = αx_i + (1-α)s_{i-1} is a sequential scan per key (or a
    power-weight prefix sum whose (1-α)^{-i} factors overflow doubles
    after ~1000 rows); the h-term form is h LAGs over ONE key-hash
    exchange, identical arithmetic on every engine, any partitioning.

    Rows with fewer than `horizon` predecessors use the available
    prefix renormalized by the matching weight sum (pandas
    `ewm(adjust=True)` semantics) so early rows aren't biased low.
    """
    a = alpha_pct / 100.0
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    x = F.col(value_col)
    num = x * F.lit(1.0)
    den = F.lit(1.0)
    for k in range(1, horizon):
        wt = F.lit((1.0 - a) ** k)
        lagk = F.lag(x, k).over(w)
        num = num + F.coalesce(lagk * wt, F.lit(0.0))
        den = den + F.when(lagk.isNotNull(), wt).otherwise(F.lit(0.0))
    return df.withColumn("ewma", num / den)


def _step_unit(step: str) -> str:
    """Validate and parse the gap-fill `step` string ("1 hour") into its
    truncation unit. The grid is anchored with date_trunc(unit), so only
    single-unit steps ("1 hour", "1 day") produce observations that land
    exactly on sequence() ticks — a multi-unit step like "6 hours" would
    truncate observations to ticks the grid skips and silently drop them.
    Both gap-fill variants share this contract; violations raise at plan
    build instead of corrupting output."""
    parts = step.split()
    if len(parts) != 2 or parts[0] != "1":
        raise ValueError(
            f"gap-fill step must be a single unit like '1 hour' (got {step!r}): "
            "multi-unit steps misalign date_trunc ticks with the sequence() grid"
        )
    return parts[1].rstrip("s")


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an irregular per-key time series onto a fixed grid
    with last-observation-carried-forward interpolation — the resample
    step sensor/metric pipelines run before any windowed model.

    Grid: per key, every `step` tick from its first observation's
    truncated tick through its last. Each tick reports the latest
    in-or-before observation (`last(ignorenulls)` over an unbounded
    preceding frame — one window over the same key-hash exchange the
    grid join already made). Ticks before a key's first observation
    cannot exist by construction, so the LOCF never emits nulls.

    Scale: the grid is generated with `sequence()` per KEY (no
    cross-join against a global calendar — a key spanning 2 days
    explodes to 48 rows no matter how long the table's total span
    is), then one left join on (key, tick) and one window. Grid size
    is data-dependent and bounded by span/step per key; the honest
    failure mode (a single key spanning years at 1-second step) is
    the same one any resample has, and belongs to the caller's step
    choice.
    """
    unit = _step_unit(step)  # "1 hour" -> hour
    tick = F.date_trunc(unit, F.col(ts_col))
    grid = (
        df.groupBy(key_col)
        .agg(
            F.min(tick).alias("__lo"),
            F.max(tick).alias("__hi"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence("__lo", "__hi", F.expr(f"interval {step}"))
            ).alias("tick"),
        )
    )
    # latest observation per (key, tick): ties within a tick resolve
    # to the max-ts row (deterministic given unique (key, ts))
    obs = (
        df.withColumn("tick", tick)
        .groupBy(key_col, "tick")
        .agg(F.max_by(F.col(value_col), F.col(ts_col)).alias("__v"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("tick")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [key_col, "tick"], "left")
        .select(
            F.col(key_col),
            F.col("tick"),
            F.last("__v", ignorenulls=True).over(w).alias("value_filled"),
            F.col("__v").isNotNull().alias("is_observed"),
        )
    )


def gap_fill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an irregular per-key time series onto a fixed grid
    with LINEAR interpolation — the numeric sibling of `gap_fill_locf`
    (LOCF holds a metric flat; a rate or a level that genuinely moves
    between observations wants the straight line through the bracketing
    points). Grid construction is identical to the LOCF twin (per-key
    `sequence()`, never a global-calendar cross join).

    Each unobserved tick between two observed ticks reports
    prev + (next - prev) * (t - t_prev) / (t_next - t_prev); observed
    ticks pass their value through untouched. The grid spans [first
    observation, last observation] per key, so every unobserved tick
    has both brackets by construction (a defensive LOCF branch covers
    a bracket-less tick anyway). Values are micro-floored
    (floor(x*1e6+0.5)/1e6) so the double blend is engine-exact against
    the DuckDB oracle — same convention as char_entropy/psi.

    Output: (key, tick, value_filled, is_observed).

    Scale: one grid join + two windows (preceding-last, following-
    first) over the SAME key-hash exchange; both frames are running
    scans, no re-sort. Same per-key span/step bound as the LOCF twin.
    """
    unit = _step_unit(step)
    tick = F.date_trunc(unit, F.col(ts_col))
    grid = (
        df.groupBy(key_col)
        .agg(F.min(tick).alias("__lo"), F.max(tick).alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("__lo", "__hi", F.expr(f"interval {step}"))
            ).alias("tick"),
        )
    )
    obs = (
        df.withColumn("tick", tick)
        .groupBy(key_col, "tick")
        .agg(F.max_by(F.col(value_col), F.col(ts_col)).alias("__v"))
    )
    wp = (
        Window.partitionBy(key_col)
        .orderBy("tick")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("tick")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_s = F.unix_timestamp("tick")
    obs_tick_s = F.when(F.col("__v").isNotNull(), t_s)
    base = grid.join(obs, [key_col, "tick"], "left").select(
        key_col,
        "tick",
        "__v",
        F.last("__v", ignorenulls=True).over(wp).alias("__pv"),
        F.last(obs_tick_s, ignorenulls=True).over(wp).alias("__pt"),
        F.first("__v", ignorenulls=True).over(wf).alias("__nv"),
        F.first(obs_tick_s, ignorenulls=True).over(wf).alias("__nt"),
    )
    blend = F.col("__pv") + (F.col("__nv") - F.col("__pv")) * (
        (F.unix_timestamp("tick") - F.col("__pt")) / (F.col("__nt") - F.col("__pt"))
    )
    filled = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(F.col("__nv").isNull(), F.col("__pv"))
        .otherwise(blend)
    )
    return base.select(
        F.col(key_col),
        F.col("tick"),
        (F.floor(filled * 1000000.0 + 0.5) / 1000000.0).alias("value_filled"),
        F.col("__v").isNotNull().alias("is_observed"),
    )


def resample_ohlc(
    events: DataFrame,
    bucket_seconds: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """W16: time-bucket downsampling with open/high/low/close — the
    classic time-series resample (financial OHLC bars, metrics rollup).
    One row per (key, bucket): first value, last value, min, max, count,
    ordered within the bucket by (ts, tiebreak) so simultaneous events
    resolve deterministically.

    Single hash aggregation, no window functions: open/close use
    `min_by`/`max_by` with a (ts_micros, tiebreak) STRUCT ordering key
    (structs are orderable in Spark, compared field-by-field), so the
    whole op is one partial-aggregated shuffle on (key, bucket) — the
    map-side combine collapses each partition to one candidate row per
    group before the exchange. At 100 TB that beats the two
    row_number() window passes an ORDER BY formulation needs (window
    sort >> agg combine), and the bucket key is time-derived so
    ingest-time partitioning co-locates it for free.

    The bucket is exposed as epoch-bucket BIGINT (`bucket_start_s` =
    bucket index * bucket_seconds) rather than a timestamp: integer
    epoch arithmetic is engine-portable (no session-timezone relabel
    hazards), and callers can cast to timestamp at the edge.
    """
    ts_us = F.unix_micros(F.col(ts_col))
    # exact bigint bucket arithmetic: mod-subtract instead of floor of
    # a double division (the subtracted numerator is an exact multiple
    # of 1e6, so the one remaining division is integral and exact in
    # IEEE double — bit-identical to the oracle's integer //)
    us_per_bucket = F.lit(int(bucket_seconds) * 1_000_000)
    bucket_start = ((ts_us - ts_us % us_per_bucket) / F.lit(1_000_000)).cast("long")
    order_key = F.struct(ts_us.alias("t"), F.col(tiebreak_col).alias("i"))
    return (
        events.groupBy(
            F.col(key_col), bucket_start.cast("long").alias("bucket_start_s")
        )
        .agg(
            F.min_by(F.col(value_col), order_key).alias("open_value"),
            F.max_by(F.col(value_col), order_key).alias("close_value"),
            F.min(value_col).alias("low_value"),
            F.max(value_col).alias("high_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
