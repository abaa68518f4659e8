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
