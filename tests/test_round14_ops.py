"""Round-14 operators and hardening.

Covers the r13 advice items on the persisted-index surfaces
(`index_partition_files` non-integer partitions, the
`ivfpq_refit_drifted` corpus-coverage guard) plus the round's new
surfaces as they land (generation-pinned index maintenance, the
multimodal corpus-ingest capstone).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestIndexPartitionFilesNonInteger:
    def test_skips_non_integer_partition_dirs(self, spark, tmp_path):
        # advice r13: a __HIVE_DEFAULT_PARTITION__ (null bucket) or a
        # string partition value must be skipped, not abort the whole
        # compaction/refit with a ValueError
        import os

        from chesscom_etl_tableau_spark.operators.similarity import (
            compact_partitioned_index,
            index_partition_files,
        )

        d = str(tmp_path / "idx")
        df = spark.createDataFrame(
            [(1, 1.0, 0), (2, 2.0, 1)], "vec_id long, v double, bucket int"
        )
        df.write.partitionBy("bucket").parquet(d)
        os.makedirs(os.path.join(d, "bucket=__HIVE_DEFAULT_PARTITION__"))
        os.makedirs(os.path.join(d, "bucket=abc"))
        files = index_partition_files(d, "bucket")
        assert set(files) == {0, 1}
        # compaction over the same layout must not crash either
        assert compact_partitioned_index(spark, d, "bucket") >= 0


class TestIvfPqRefitCorpusGuard:
    def _emb(self, spark):
        rows = [
            (i, [((i * 7 + j * 3) % 11) / 10.0 + 0.1 for j in range(4)])
            for i in range(16)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def _setup(self, spark, d):
        from chesscom_etl_tableau_spark.operators.similarity import (
            assign_buckets,
            pq_encode,
            pq_train,
        )

        emb = self._emb(spark)
        cents = emb.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        cent2 = cents.select(
            F.col("centroid_id").alias("bucket"),
            F.col("embedding").alias("__cvec"),
        )
        res = assign_buckets(emb, cents).join(F.broadcast(cent2), "bucket").select(
            "vec_id",
            "bucket",
            F.zip_with(
                F.col("embedding"), F.col("__cvec"), lambda x, c: x - c
            ).alias("__res"),
        )
        books = pq_train(res, m=2, k=4, vec_col="__res", dim=4, corpus_rows=16)
        pq_encode(res, books, vec_col="__res", keep=("bucket",)).select(
            "vec_id", "bucket", "codes"
        ).write.partitionBy("bucket").parquet(d)
        return emb, cents, books

    def test_missing_corpus_ids_raise(self, spark, tmp_path):
        # advice r13: a stale corpus missing indexed ids must abort the
        # refit, not silently drop those rows from the rewritten
        # drifted partitions
        from chesscom_etl_tableau_spark.operators.similarity import (
            ivfpq_refit_drifted,
        )

        d = str(tmp_path / "pq")
        emb, cents, books = self._setup(spark, d)
        zero_baseline = spark.createDataFrame(
            [(0, 1, 0), (1, 1, 0)],
            "bucket int, n_vectors long, mean_resid_micro long",
        )
        stale = emb.where(F.col("vec_id") % 3 != 0)  # ids 0,3,6,... gone
        with pytest.raises(ValueError, match="no row in `corpus`"):
            ivfpq_refit_drifted(spark, d, cents, books, stale, zero_baseline)
        # and the index was NOT rewritten: all 16 codes still present
        assert spark.read.parquet(d).count() == 16

    def test_full_corpus_passes_guard(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.operators.similarity import (
            ivfpq_refit_drifted,
        )

        d = str(tmp_path / "pq_ok")
        emb, cents, books = self._setup(spark, d)
        zero_baseline = spark.createDataFrame(
            [(0, 1, 0), (1, 1, 0)],
            "bucket int, n_vectors long, mean_resid_micro long",
        )
        updated, drifted = ivfpq_refit_drifted(
            spark, d, cents, books, emb, zero_baseline
        )
        assert drifted
        assert spark.read.parquet(d).count() == 16
