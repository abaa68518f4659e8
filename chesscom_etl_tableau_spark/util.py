"""Small shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan has too few partitions.

    CPU-heavy per-row stages (shingling, hashing, vector math, Pandas
    UDFs) parallelize by input split; a small parquet file arrives as a
    single split and would otherwise run single-core no matter how many
    executors exist. At real scale the scan has natural splits and this
    is a no-op; the repartition only fires when the source is narrower
    than the cluster, and the data it shuffles is by definition small.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
