"""Streaming exact deduplication of a document feed.

The batch twin is `operators/dedup.py::exact_dedup`; this keeps a
continuously-arriving corpus duplicate-free WITHOUT re-scanning it:
the dedup key is the normalized content fingerprint and Spark's
streaming state store remembers every key seen so far.

Two knobs, two scale regimes:

- `within_watermark=False` (default): `dropDuplicates` on the
  fingerprint — state grows with the number of DISTINCT documents ever
  seen and is never evicted. Exact forever, the right choice when the
  corpus fits the state store (keys are 32-byte md5, so 1B docs ≈
  tens of GB across executors — viable with RocksDB state store).
- `within_watermark=True`: `dropDuplicatesWithinWatermark` — only
  duplicates arriving within the event-time watermark window are
  collapsed, and state for sealed windows is evicted. Bounded state;
  the cross-window residue is handled by a periodic batch
  `exact_dedup` compaction (the standard lambda-ish split: streaming
  removes the hot duplicates, batch guarantees the invariant).

Exactly-once: the dedup state lives in the checkpoint, so a restart
neither re-admits a seen fingerprint nor drops an unseen one
(asserted by the kill-and-restart test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.text import normalized_fingerprint


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark_delay: str = "10 minutes",
    within_watermark: bool = False,
) -> DataFrame:
    """docs stream -> stream of first-seen rows per content fingerprint.

    Emits the original columns plus the `fingerprint` the state is
    keyed on. With `within_watermark`, `ts_col` is required and the
    stream must carry event time.
    """
    keyed = docs.withColumn("fingerprint", normalized_fingerprint(F.col(text_col)))
    if within_watermark:
        if ts_col is None:
            raise ValueError("within_watermark dedup needs an event-time column")
        return keyed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return keyed.dropDuplicates(["fingerprint"])
