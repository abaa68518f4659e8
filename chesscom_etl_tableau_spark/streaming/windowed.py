"""Watermarked windowed aggregation + stream-static enrichment — the
two canonical Structured Streaming shapes next to sessionization
(streaming/sessionize.py) and stateful dedup (streaming/dedup_stream.py).

- `windowed_event_counts`: tumbling (or sliding) event-time windows
  with late-data tolerance. Append mode: a window row is emitted
  exactly once, when the watermark passes window end — the streaming
  twin of the batch `groupBy(date_trunc(...))` rollups (W2).
- `enrich_with_dim`: stream-static broadcast join. The static side is
  re-resolved per micro-batch, so a slowly-changing dimension picks up
  updates without restarting the query; the join itself never
  shuffles the stream (broadcast).

Scale: state per group is one partial aggregate per (window, key) —
bounded by watermark eviction; no per-event state. The dimension side
must fit the broadcast threshold, which is the same constraint the
batch star joins (J3) already assume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    slide_duration: str | None = None,
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """events stream -> (window_start, window_end, key, n_events,
    n_users) rows, sealed by the watermark (append mode)."""
    win = (
        F.window(ts_col, window_duration, slide_duration)
        if slide_duration
        else F.window(ts_col, window_duration)
    )
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "n_users",
        )
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static broadcast join: every micro-batch joins against
    the CURRENT state of the static side (re-resolved per batch)."""
    return stream.join(F.broadcast(dim), on, "left")


def windowed_ohlc(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of the batch `operators/windows.py::resample_ohlc`:
    per (key, tumbling window) open/high/low/close bars sealed by the
    watermark (append mode — one immutable bar per window, the shape a
    downstream metrics store wants).

    open/close ride `min`/`max` over a (ts, tiebreak, value) STRUCT:
    struct min/max are ordinary partial aggregates, so the streaming
    state per open bar is two structs + two doubles + a count — O(1)
    per (key, window), evicted at the watermark like any windowed agg
    (no per-event state, unlike sessionization). The tiebreak field
    makes same-instant opens/closes deterministic, and the value field
    rides along WITHOUT affecting the ordering (the (ts, tiebreak)
    prefix always decides first, tiebreak being unique).

    1-hour tumbling windows are epoch-aligned, so `window_start ==
    timestamp(bucket_start_s)` of the batch op — batch/stream
    equivalence is asserted in tests.
    """
    ordered = F.struct(
        F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("i"),
        F.col(value_col).alias("v"),
    )
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"), F.col(key_col))
        .agg(
            F.min(ordered).alias("__o"),
            F.max(ordered).alias("__c"),
            F.min(value_col).alias("low_value"),
            F.max(value_col).alias("high_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            F.col("__o.v").alias("open_value"),
            F.col("__c.v").alias("close_value"),
            "low_value",
            "high_value",
            "n_events",
        )
    )
