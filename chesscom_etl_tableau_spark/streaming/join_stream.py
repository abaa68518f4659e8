"""Stream-stream event-time interval join — the fourth canonical
Structured Streaming shape next to sessionization, stateful dedup and
watermarked windowed aggregation.

The textbook case is impression->click attribution: a click joins the
impression with the same key when it lands within `within` of the
impression's event time. Spark keeps BOTH sides in state and uses the
pair of watermarks plus the time-range conjunct to evict: an impression
can be dropped once the click watermark passes `impression_ts +
within`, a click once the impression watermark passes `click_ts`. State
is therefore bounded by (arrival rate x (watermark + within)) per side
— no unbounded growth — which is what makes this shape viable on an
unbounded 100 TB/day stream where a batch self-join is not.

Left-outer emits the unmatched left row (right side NULL) only after
the watermark proves no match can still arrive — attribution's
"impression with no click" output. Right-outer is the mirror
(unmatched click with NULL impression columns), and full-outer emits
BOTH eviction kinds: every state-expired row on either side leaves
exactly once, null-completed on the other side, so the output equals
the batch FULL JOIN with the same interval predicate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "30 minutes",
    within: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on `on` where `right_ts` falls in
    [left_ts, left_ts + within]. Column names other than `on` must be
    disjoint between the two sides (the attribution shape: the click
    stream carries its own ts column name).

    `how` is "inner", "leftOuter", "rightOuter" or "fullOuter" (Spark
    requires a watermark on both sides plus a two-sided time-range
    conjunct for the outer modes; the range below bounds the join both
    ways, so state on each side is evictable). For the right/full modes
    the join key is emitted as coalesce(left, right) — an unmatched
    right row has no left key to carry.
    """
    if how not in ("inner", "leftOuter", "rightOuter", "fullOuter"):
        raise ValueError(
            f"how must be inner/leftOuter/rightOuter/fullOuter, got {how!r}"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    conds = [
        l[on] == r[on],
        r[right_ts] >= l[left_ts],
        r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"),
    ]
    joined = l.join(r, reduce(lambda a, b: a & b, conds), how)
    key_from_either = how in ("rightOuter", "fullOuter")
    return joined.select(
        *[
            F.coalesce(l[on], r[on]).alias(on)
            if c == on and key_from_either
            else l[c]
            for c in left.columns
        ],
        *[r[c] for c in right.columns if c != on],
    )
