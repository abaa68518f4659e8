"""Curated-output sinks (SURVEY.md §2.1 S5/S10).

The reference's sinks are Google-Sheets tabs consumed by a BI model
(Chess Analytics.pbix reads the `Games` sheet). The Spark equivalents:

- `write_fact_partitioned`: the fact table partitioned by event month —
  the layout that makes date-sliced dashboard queries (F2) and the I3
  open-month re-read partition-pruned scans at 100 TB.
- `write_bucketed`: a bucketed+sorted managed table on the dedup key.
  The J1 anti-join (new keys vs existing sink) then needs NO shuffle on
  the sink side — each task reads its bucket and joins locally. This is
  the scale answer to the reference's O(total rows) key re-scan
  (fetch_and_post.py:230-249).
- `export_for_bi`: S10 — flat single-directory parquet (or csv) export,
  the handoff a BI connector ingests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_fact_partitioned(games: DataFrame, path: str, mode: str = "append") -> None:
    """Append the fact table partitioned by `date_month` (yyyy-MM).

    Month granularity mirrors the source's archive granularity: one
    partition per (still-growing) month keeps re-processing (I3) and
    date-range pruning (F2) aligned with the write pattern.
    """
    (
        games.withColumn("date_month", F.date_format("date_ymd", "yyyy-MM"))
        .write.mode(mode)
        .partitionBy("date_month")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save as a table bucketed+sorted by `bucket_col`.

    Joins/aggregations keyed on `bucket_col` against this table read
    bucket-locally — no Exchange on this side of the plan (verified in
    tests). `num_buckets` should be sized so one bucket of the largest
    partition fits an executor's memory at target scale. With `path`
    the table is external (data outlives a DROP TABLE).
    """
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def discover_partition_columns(spark: SparkSession, path: str) -> list[str]:
    """Hive-style partition columns of a parquet directory, in nesting
    order, discovered from the `col=value` directory names (works on any
    Hadoop-supported filesystem, not just local disk)."""
    cols: list[str] = []
    fs, p = _hadoop_fs(spark, path)
    while True:
        subdirs = [
            st.getPath().getName()
            for st in fs.listStatus(p)
            if st.isDirectory() and "=" in st.getPath().getName()
        ]
        if not subdirs:
            return cols
        name = subdirs[0].split("=", 1)[0]
        cols.append(name)
        p = next(
            st.getPath()
            for st in fs.listStatus(p)
            if st.isDirectory() and st.getPath().getName().startswith(f"{name}=")
        )


def compact_parquet(spark: SparkSession, path: str, target_partitions: int = 8) -> int:
    """Rewrite a parquet directory into `target_partitions` files per
    write, PRESERVING any Hive-style partition layout.

    Incremental appends (micro-batches, per-archive writes) accumulate
    small files; at scale small files dominate scan/open cost. This is
    the maintenance pass a table format would call OPTIMIZE. Partition
    columns are auto-discovered from the directory names and re-applied
    with `partitionBy`, so a sink written by `write_fact_partitioned`
    keeps its pruning-friendly layout (a flat round-trip would silently
    demote `date_month` to a data column). The delete/rename swap goes
    through the Hadoop FileSystem API, so it works on object stores as
    well as local disk. Assumes the single-writer discipline the
    reference also relies on (fetch.yml:16-18). Returns the row count.
    """
    import uuid

    part_cols = discover_partition_columns(spark, path)
    df = spark.read.parquet(path)
    n = df.count()
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    if part_cols:
        # repartition on the partition columns: each task writes whole
        # partition directories, one file per (task, partition-value).
        (
            df.repartition(target_partitions, *part_cols)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp)
        )
    else:
        df.repartition(target_partitions).write.mode("overwrite").parquet(tmp)
    fs, dst = _hadoop_fs(spark, path)
    _, src = _hadoop_fs(spark, tmp)
    fs.delete(dst, True)
    if not fs.rename(src, dst):
        raise OSError(f"compact_parquet: rename {tmp} -> {path} failed")
    return n


def export_for_bi(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """S10: flat export of a curated result for the BI connector."""
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
    else:
        writer.parquet(path)


def zorder_value(cols: list, bits: int = 16):
    """Z-order (Morton) key over 2+ non-negative integer columns: the
    bits of each dimension interleaved into one bigint. Rows close in
    EVERY dimension get close z-values, so range-partitioning the write
    on this key gives each output file a narrow min/max range in ALL
    dimensions at once — parquet row-group / file skipping then prunes
    multi-dimensional predicates, where a lexicographic sort only helps
    the leading column. Pure Catalyst bit arithmetic (shiftleft/or),
    no UDF.

    Each input column is clamped into [0, 2^bits); callers map raw
    values into that domain first (e.g. day-number, id % 2^bits).
    `bits * len(cols)` must be <= 63.
    """
    from pyspark.sql import functions as F

    if bits * len(cols) > 63:
        raise ValueError("interleaved width exceeds a bigint")
    ndim = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(cols):
            src = F.least(
                F.greatest(F.col(c).cast("long"), F.lit(0)),
                F.lit((1 << bits) - 1),
            )
            bit = F.shiftright(src, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ndim + d))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """OPTIMIZE ZORDER-style layout rewrite: range-partition on the
    Morton key of `cols`, sort within partitions, write parquet. Each
    file then covers a narrow z-range = a narrow range in every
    z-dimension, so point/range predicates on ANY of the dimensions
    skip most files via parquet min/max stats (verified against a
    round-robin layout in tests)."""
    from pyspark.sql import functions as F

    z = zorder_value(cols, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
