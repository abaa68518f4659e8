"""Status-log sink (SURVEY.md §2.1 S7, §2.7 I7).

The reference appends a best-effort telemetry row per pipeline stage to
the StatusLog sheet and swallows logging failures so telemetry can
never break the pipeline (fetch_and_post.py:265-271). Stage names are
kept verbatim from the reference so dashboards port 1:1
(fetch_and_post.py:324,341,349,376,382,386,394,397).
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession

from chesscom_etl_tableau_spark.schemas import STATUS_LOG_SCHEMA

# The 8 reference stages (SURVEY.md §5).
STAGES = (
    "error_fetch_archives",
    "error_archive_download",
    "archive_no_games",
    "no_new_unique_games",
    "games_appended",
    "error_append_games",
    "archive_processed",
    "error_append_processed",
)


class StatusLogger:
    """Append-only, best-effort log writer over parquet."""

    def __init__(self, spark: SparkSession, path: str | None, run_id: str | None = None):
        self.spark = spark
        self.path = path
        self.run_id = run_id or uuid.uuid4().hex[:12]

    def log(self, stage: str, username: str | None = None, message: str | None = None, http_status: str | None = None) -> None:
        if not self.path:
            return
        try:
            from pyspark.sql import functions as F

            row = self.spark.createDataFrame(
                [(self.run_id, username, stage, message, http_status)],
                "run_id string, username string, stage string, message string, http_status string",
            ).withColumn("timestamp_utc", F.current_timestamp())
            row.select([f.name for f in STATUS_LOG_SCHEMA.fields]).write.mode("append").parquet(self.path)
        except Exception:
            # Best-effort by contract: a telemetry failure must never
            # fail the pipeline (fetch_and_post.py:270-271).
            pass
