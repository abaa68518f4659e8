"""Skew-resistant aggregation via key salting.

At 100 TB a handful of hot keys (a bot opponent with millions of games,
an empty-string ECO) can make one reducer the job's critical path. AQE's
skew-join splitting handles joins; for *aggregations* the standard cure
is salting: spread each key over `salt` sub-keys, partially aggregate,
then combine the partials. Two shuffles, but each is balanced — the hot
key's rows land on `salt` reducers instead of one.

Spark already does map-side partial aggregation, which usually absorbs
skew for algebraic aggregates; explicit salting matters when the
per-partition key cardinality is too high for the hash map (partials
spill) or the combine ratio is poor. These helpers exist for that case
and as the documented pattern; results are identical to the unsalted
aggregation.

Only algebraic aggregates (sum/count/min/max, and avg as sum/count) can
be salted this way — holistic ones (exact median) cannot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    `aggs` maps output column name -> (partial_expr, final_expr), where
    the partial runs per (key, salt-bucket) and the final combines the
    partials per key, referencing the partial's column by output name,
    e.g.  {"n": (F.count(F.lit(1)), F.sum("n"))}.
    """
    # Row-position salt: independent of the key (same key spreads over
    # all buckets) and deterministic for a fixed input partitioning.
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[f.alias(name) for name, (_, f) in aggs.items()]
    )


def salted_count_by_key(df: DataFrame, key_cols: Sequence[str], salt: int = 16) -> DataFrame:
    """COUNT(*) per key, skew-spread over `salt` sub-keys.

    Output is identical to ``df.groupBy(keys).count()`` — the salt only
    changes the shuffle layout.
    """
    return salted_agg(
        df,
        key_cols,
        {"n_rows": (F.count(F.lit(1)), F.sum("n_rows"))},
        salt=salt,
    )


def skew_report(
    df: DataFrame, key_cols: Sequence[str], top_k: int = 10
) -> DataFrame:
    """Key-distribution skew report — the measurement that DECIDES
    whether `salted_agg` / AQE skew handling is needed, instead of
    guessing: top-k heaviest keys with their share of all rows, plus
    the Gini coefficient of the key-count distribution (0 = perfectly
    uniform keys, →1 = one key owns the table).

    Gini via the exact rank formula over counts sorted ascending
    (c_1 ≤ … ≤ c_n):  G = 2·Σ i·c_i / (n·Σc) − (n+1)/n — all-integer
    numerators, one IEEE division, engine-exact. Ties in counts order
    by key so the rank sum is deterministic.

    Cost: one groupBy over the key (the same aggregate any profiling
    pass pays) — everything after runs on |distinct keys| rows, which
    is the broadcast-sized side by assumption (if it isn't, the skew
    question has answered itself).
    """
    from pyspark.sql import Window

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").asc(), *[F.col(k).asc() for k in key_cols])
    ranked = counts.withColumn("__i", F.row_number().over(w))
    g = ranked.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("cnt").alias("__tot"),
        F.sum(F.col("__i") * F.col("cnt")).alias("__isum"),
    ).select(
        "__n",
        "__tot",
        (
            F.floor(
                (
                    F.lit(2.0) * F.col("__isum") / (F.col("__n") * F.col("__tot"))
                    - (F.col("__n") + F.lit(1.0)) / F.col("__n")
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("gini"),
    )
    top = counts.orderBy(
        F.col("cnt").desc(), *[F.col(k).asc() for k in key_cols]
    ).limit(top_k)
    return top.join(F.broadcast(g)).select(
        *key_cols,
        "cnt",
        (
            F.floor(
                F.col("cnt") / F.col("__tot") * F.lit(1000000.0) + F.lit(0.5)
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("share"),
        F.col("gini"),
        F.col("__n").alias("n_keys"),
    )
