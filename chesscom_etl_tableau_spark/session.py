"""SparkSession factory with scale-oriented defaults.

The reference runs single-threaded Python on a 2-vCPU runner
(BASELINE.md); this engine targets a multi-executor cluster. The
defaults below are the ones that matter at 100 TB:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing).
- ``spark.sql.shuffle.partitions`` sized for the test harness (32 on
  local[32]); on a real cluster this should be ~2-3x total cores or
  left to AQE's coalescing with a high initial value.
- Arrow enabled so any Pandas-UDF path is vectorized batch transfer.
- UTC session timezone so epoch/date derivations are reproducible
  (mirrors the reference's use of UTC everywhere,
  fetch_and_post.py:119-129).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")


def get_spark(
    app_name: str = "chesscom-etl-tableau-spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        # Pin ANSI explicitly (Spark 4 default): the engine relies on
        # try_cast/try_divide for the tolerate-garbage paths, and ANSI
        # off would silently change overflow/cast semantics.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) (e.g. the events table) is not a legal
        # Spark type; read as epoch-nanos long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Console progress bars would interleave with the driver's
        # 2000-char stdout tail capture of bench.py's final JSON line.
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
