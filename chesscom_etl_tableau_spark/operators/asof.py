"""As-of (most-recent-at-or-before) join — beyond the reference surface
(SURVEY.md §2.9 lists it as an explicit gap; it is a staple of event /
time-series pipelines over tables like `events`).

Semantics: for every left row, attach the single right row with the
largest ``right_ts <= left_ts`` within the same key group (DuckDB
``ASOF JOIN`` / pandas ``merge_asof`` semantics, left-outer flavor:
left rows with no earlier right row keep NULLs).

Spark has no built-in as-of join, and the naive formulation —
``left JOIN right ON key = key AND r_ts <= l_ts`` + pick max — is a
broadcast-nested-loop / O(|L|·|R|) expansion per key. The scalable
plan used here is the **union-tag trick**:

  1. union left and right rows with a ``side`` tag (right = 0,
     left = 1), carrying right's payload columns as NULL on left rows;
  2. one window per key ordered by ``(ts, side)`` with a running
     ``last(payload, ignorenulls=True)`` over
     ``rowsBetween(unboundedPreceding, currentRow)``;
  3. keep only the left rows.

That is ONE shuffle on the key (the same shuffle any per-key analysis
pays) and a single sort — no join explosion, no skew amplification:
a hot key costs O(n log n) locally instead of O(n·m). Ordering right
before left at equal timestamps implements the ``<=`` bound.

Determinism: callers must make the right side unique per
``(key, right_ts)`` (pre-aggregate) — otherwise "the" most recent row
is ambiguous in every engine. Left-row ties are harmless: left rows
contribute NULL payloads, so they never affect each other's
``last(..., ignorenulls)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: latest right row with ``right_ts <= left_ts`` per key.

    Output = all left columns + ``{prefix}ts`` + ``{prefix}<payload>``
    for each right payload column. Right MUST be unique per
    ``(key_cols, right_ts)`` for deterministic results.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (*key_cols, right_ts)
    ]
    left_cols = [c for c in left.columns]

    r = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in left_cols],
    )
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{prefix}ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c)
        for c in (f"{prefix}ts", *[f"{prefix}{p}" for p in payload_cols])
    ]
    return (
        l.unionByName(r)
        .select(*key_cols, "_side", *[f"_l_{c}" for c in left_cols], *filled)
        .where(F.col("_side") == 1)
        .select(
            *[F.col(f"_l_{c}").alias(c) for c in left_cols],
            f"{prefix}ts",
            *[f"{prefix}{p}" for p in payload_cols],
        )
    )
