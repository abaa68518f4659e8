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


def asof_join_directions(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """`asof_join` with the full pandas ``merge_asof`` direction
    surface over TIMESTAMP keys:

    - ``backward``: latest right row with ``right_ts <= left_ts``;
    - ``forward``: earliest right row with ``right_ts >= left_ts``;
    - ``nearest``: whichever of the two is closer in time (exact tie
      -> backward, pandas' rule);
    - ``tolerance_s``: matches farther than this many seconds are
      nulled out (applied per direction BEFORE the nearest choice,
      as pandas does).

    Plan shape is unchanged from `asof_join` — ONE shuffle on the key,
    ONE sort; both window frames (running last over preceding, running
    first over following) share the same partitioning and ordering, so
    Spark evaluates them in a single WindowExec. The equal-timestamp
    subtlety: rights sort BEFORE lefts at equal ts (implementing
    ``<=`` for backward), which hides an equal-ts right from the
    following-frame — but that right is exactly the backward match
    with distance 0, so forward promotes it: a backward match at
    distance 0 IS the forward match (right is unique per (key, ts)).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (*key_cols, right_ts)
    ]
    left_cols = list(left.columns)

    r = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_b_ts"),
        *[F.col(c).alias(f"_b_{c}") for c in payload_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in left_cols],
    )
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_b_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_b_{c}")
            for c in payload_cols
        ],
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    base = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
    )
    w_b = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_f = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols = ["_b_ts"] + [f"_b_{c}" for c in payload_cols]
    proj = [
        F.last(F.col(c), ignorenulls=True).over(w_b).alias(f"__bk{c}") for c in cols
    ] + [
        F.first(F.col(c), ignorenulls=True).over(w_f).alias(f"__fw{c}") for c in cols
    ]
    frame = (
        l.unionByName(r)
        .select(*key_cols, "_side", "_ts", *[f"_l_{c}" for c in left_cols], *proj)
        .where(F.col("_side") == 1)
    )
    # promote the distance-0 backward match into the forward slot
    eq = F.col("__bk_b_ts") == F.col("_ts")
    fwd = {c: F.when(eq, F.col(f"__bk{c}")).otherwise(F.col(f"__fw{c}")) for c in cols}
    bwd = {c: F.col(f"__bk{c}") for c in cols}
    d_b = F.unix_micros(F.col("_ts")) - F.unix_micros(bwd["_b_ts"])
    d_f = F.unix_micros(fwd["_b_ts"]) - F.unix_micros(F.col("_ts"))
    if tolerance_s is not None:
        tol = F.lit(int(tolerance_s * 1_000_000))
        in_b, in_f = d_b <= tol, d_f <= tol
        bwd = {c: F.when(in_b, v) for c, v in bwd.items()}
        fwd = {c: F.when(in_f, v) for c, v in fwd.items()}
        d_b = F.when(in_b, d_b)
        d_f = F.when(in_f, d_f)
    if direction == "backward":
        chosen = bwd
    elif direction == "forward":
        chosen = fwd
    else:  # nearest: closer wins, exact tie -> backward; NULLs lose
        take_b = F.when(
            d_b.isNotNull() & (d_f.isNull() | (d_b <= d_f)), F.lit(True)
        ).otherwise(F.lit(False))
        chosen = {
            c: F.when(take_b, bwd[c]).otherwise(fwd[c]) for c in cols
        }
    out_names = {"_b_ts": f"{prefix}ts"}
    out_names.update({f"_b_{c}": f"{prefix}{c}" for c in payload_cols})
    return frame.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[chosen[c].alias(out_names[c]) for c in cols],
    )
