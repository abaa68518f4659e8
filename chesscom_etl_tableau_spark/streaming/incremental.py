"""Streaming ingest: the reference's cron-batch pipeline as Structured
Streaming (SURVEY.md §2.7 I1-I9).

The reference is a daily micro-batch job with a checkpointed watermark
and per-partition seen-set. The native Spark translation:

- **source**: file source over a drop directory of archive JSON
  (`readStream.schema(ARCHIVE_SCHEMA).json`); the source's seen-files
  log subsumes `processed_archives` (I4), and `Trigger.AvailableNow`
  subsumes the daily cron + concurrency group (I9) — each invocation
  drains whatever is new, exactly once, then stops.
- **dedup**: `dropDuplicatesWithinWatermark` on `game_url` with an
  event-time watermark (I1/I2): duplicates arriving within the
  allowed lateness (the reference's re-fetched open month, I3) are
  dropped by state; the checkpoint makes it exactly-once across runs.
- **sink**: append parquet via `foreachBatch` so the fact write and
  the audit write happen per epoch (S5/S6).

At scale: the same topology runs continuously with a processing-time
trigger; state size is bounded by the watermark horizon, not history,
because `dropDuplicatesWithinWatermark` evicts expired keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chesscom_etl_tableau_spark.schemas import ARCHIVE_SCHEMA
from chesscom_etl_tableau_spark.sources.archives import flatten_archives


def read_archive_stream(spark: SparkSession, drop_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """I4/I6: file-source stream of archive JSON with explicit schema."""
    reader = spark.readStream.schema(ARCHIVE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(drop_dir)


def streaming_ingest(
    spark: SparkSession,
    drop_dir: str,
    sink_path: str,
    checkpoint_path: str,
    watermark_delay: str = "45 days",
    available_now: bool = True,
    commit_protocol: str = "append",
    export_metadata: bool = False,
):
    """Run the streaming ingest; returns the StreamingQuery.

    `watermark_delay` of 45 days covers the reference's worst case:
    the open month re-fetched at month end (I3) re-delivers games up
    to ~31+ days old; anything older is already immutable.

    `commit_protocol="manifest"` routes every micro-batch through
    `commit_append_manifest` — the transactional object-store sink.
    That upgrades the delivery guarantee: the plain parquet append
    relies on the checkpoint alone (an epoch REPLAYED after a crash
    mid-write can leave duplicate rows behind), while the manifest
    commit's keyed audit makes replays idempotent end-to-end — the
    replayed batch's keys are already published, so it appends zero.
    """
    if commit_protocol not in ("append", "manifest"):
        raise ValueError(f"unknown commit_protocol {commit_protocol!r}")
    if export_metadata and commit_protocol != "manifest":
        raise ValueError("export_metadata requires commit_protocol='manifest'")
    flat = flatten_archives(read_archive_stream(spark, drop_dir))
    deduped = (
        flat.withWatermark("end_time_utc", watermark_delay)
        .dropDuplicatesWithinWatermark(["game_url"])
    )

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch gives batch-sink semantics per epoch (S5); the
        # checkpoint guarantees each epoch commits at most once.
        if commit_protocol == "manifest":
            from chesscom_etl_tableau_spark.plans.ingest import (
                commit_append_manifest,
            )

            n = commit_append_manifest(batch_df, sink_path, key_col="game_url")
            if export_metadata and n:
                # keep the Iceberg-style snapshot log current with the
                # stream: the export is derived + exclusive-create, so
                # an epoch REPLAY re-exporting the same generation is a
                # no-op — the same idempotence story as the commit
                from chesscom_etl_tableau_spark.plans.metadata_export import (
                    export_metadata_json,
                )

                export_metadata_json(batch_df.sparkSession, sink_path)
        else:
            batch_df.write.mode("append").parquet(sink_path)

    writer = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(write_epoch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_available_now(spark: SparkSession, drop_dir: str, sink_path: str, checkpoint_path: str, **kw) -> None:
    """One I9-style drain: process everything new, then stop."""
    q = streaming_ingest(spark, drop_dir, sink_path, checkpoint_path, available_now=True, **kw)
    q.awaitTermination()
