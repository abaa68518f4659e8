"""Continuous SCD Type-2 dimension maintenance over a change stream.

The last composition from NOTES.md future-work: wire a change-event
stream through ``foreachBatch`` into the manifest sink's copy-on-write
MERGE, so the dimension `operators/scd.py::scd2_build` produces in
batch is maintained continuously. The reference keeps only the latest
snapshot per user (`fetch_and_post.py`'s rating columns); this keeps
the full point-in-time history current as events arrive.

Design — per microbatch, O(touched keys + batch), never O(dimension):

1. read the OPEN versions of the batch's touched keys from the sink
   (snapshot-consistent manifest read; closed history is never read);
2. drop events at-or-before each key's open ``effective_from`` — under
   the watermark-ordered input contract those can only be REPLAYS of
   an already-committed microbatch (foreachBatch re-runs the last
   uncommitted batch on recovery), so filtering them makes the commit
   idempotent without any batch-id bookkeeping;
3. rebuild the per-key tail with `scd2_rebuild_tail` — the re-closed
   open version plus every new version, renumbered from the open
   counter;
4. MERGE those rows into the manifest sink keyed by the surrogate
   ``(key '#' version)``: the open row is replaced in place, new
   versions insert, closed history carries over by file reference
   (standard COW — untouched files are never rewritten).

Input contract (the same one `scd2_apply_changes` documents): events
arrive per-key in timestamp order ACROSS microbatches — i.e. the
source is watermark-ordered, as a sorted replay or an ordered CDC feed
is. Within a batch any order is fine (the collapse sorts). Two
distinct changes of one key must not share a timestamp across batches
(within a batch, pass `order_cols` tiebreakers). Late corrections need
a batch rebuild of the affected keys, exactly like every production
SCD2 maintainer.

Scale shape: each microbatch pays one key-hash exchange over
(open rows of touched keys + batch) for the window collapse, plus the
merge's rewrite of only the files containing touched open rows. At
100 TB dimension scale the manifest's per-file column stats on the
surrogate key let the merge's semi-join skip untouched files entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Surrogate merge key: one dimension row per (natural key, version).
DIM_KEY = "dim_key"


def _with_dim_key(df: DataFrame, key_col: str) -> DataFrame:
    return df.withColumn(
        DIM_KEY, F.concat_ws("#", F.col(key_col).cast("string"), F.col("version"))
    )


def read_scd2_dim(
    spark: SparkSession, sink_path: str, generation: int | None = None
) -> DataFrame | None:
    """Read the maintained dimension (surrogate column dropped).
    Time-travel via `generation` works as on any manifest sink."""
    from chesscom_etl_tableau_spark.plans.ingest import read_manifest_sink

    dim = read_manifest_sink(spark, sink_path, generation=generation)
    return None if dim is None else dim.drop(DIM_KEY)


def scd2_merge_batch(
    batch_df: DataFrame,
    sink_path: str,
    key_col: str,
    attr_col: str,
    ts_col: str,
    order_cols: tuple[str, ...] = (),
) -> int:
    """Apply ONE change microbatch to the dimension at `sink_path`.

    STATE-idempotent: re-running the same batch leaves the dimension
    unchanged, so foreachBatch's at-least-once replay yields
    exactly-once dimension state. Events at-or-before their key's open
    ``effective_from`` are fenced out entirely (returns 0 when the
    whole batch is such a replay); a replayed trailing NO-OP
    observation (ts advanced, attribute unchanged) is
    indistinguishable from a fresh one and harmlessly re-merges the
    open row byte-identically. Returns the number of tail rows merged.
    """
    from chesscom_etl_tableau_spark.operators.scd import scd2_rebuild_tail
    from chesscom_etl_tableau_spark.plans.ingest import (
        commit_merge_manifest,
        read_manifest_sink,
    )

    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return 0
    dim = read_manifest_sink(spark, sink_path)
    if dim is None:
        open_cur = None
        fresh = batch_df
    else:
        touched = batch_df.select(key_col).distinct()
        open_all = (
            dim.drop(DIM_KEY)
            .where(F.col("is_current"))
            .join(touched, key_col, "semi")
        )
        # Replay fence: an event at-or-before its key's open
        # effective_from was already folded into the dimension by a
        # committed microbatch. New keys (no open row) pass through.
        bounds = open_all.select(
            F.col(key_col), F.col("effective_from").alias("__open_from")
        )
        fresh = (
            batch_df.join(bounds, key_col, "left")
            .where(
                F.col("__open_from").isNull()
                | (F.col(ts_col) > F.col("__open_from"))
            )
            .drop("__open_from")
        )
        # seed only keys with SURVIVING events — a fully-fenced key
        # must not re-emit (and re-merge) its untouched open row
        open_cur = open_all.join(
            fresh.select(key_col).distinct(), key_col, "semi"
        )
    if fresh.isEmpty():
        return 0
    if open_cur is None:
        # first commit: every surviving key's tail starts at version 1
        empty = fresh.limit(0)
        open_cur = empty.select(
            F.col(key_col),
            F.col(attr_col),
            F.col(ts_col).alias("effective_from"),
            F.col(ts_col).alias("effective_to"),
            F.lit(True).alias("is_current"),
            F.lit(1).alias("version"),
        )
    delta = scd2_rebuild_tail(
        open_cur, fresh, key_col, attr_col, ts_col, order_cols
    )
    delta = _with_dim_key(delta, key_col)
    result = commit_merge_manifest(delta, sink_path, key_col=DIM_KEY)
    return result.inserted + result.updated


def streaming_scd2(
    changes: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    key_col: str,
    attr_col: str,
    ts_col: str,
    order_cols: tuple[str, ...] = (),
):
    """Attach the SCD2 maintainer to a change stream. Returns the
    started StreamingQuery (availableNow trigger — the scheduled-drain
    idiom used across this repo's streaming surface)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        scd2_merge_batch(
            batch_df, sink_path, key_col, attr_col, ts_col, order_cols
        )

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
