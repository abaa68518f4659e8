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
