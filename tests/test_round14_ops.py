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


class TestIndexGenerationLog:
    """Snapshot-isolated index maintenance (r13 verdict ask #2): the
    manifest generation-log discipline over a hive-partitioned index.
    Maintenance commits are additive + a generation publish; a reader
    pinned at generation N is untouched by compact/refit publishing
    N+1; gc is the only deletion."""

    def _fixture(self, spark, d):
        from chesscom_etl_tableau_spark.operators import index_log as IL
        from chesscom_etl_tableau_spark.operators import similarity as SIM

        rows = [
            (i, [((i * 7 + j * 3) % 11) / 10.0 + 0.1 for j in range(4)])
            for i in range(24)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        path = f"{d}/ivf"
        SIM.ivf_persist(emb.where(F.col("vec_id") % 3 != 0), cents, path)
        IL.index_log_init(path, "bucket")
        gen = IL.index_log_append(
            spark, path,
            SIM.assign_buckets(emb.where(F.col("vec_id") % 3 == 0), cents),
            "bucket",
        )
        queries = emb.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return IL, SIM, emb, cents, queries, path, gen

    def test_pinned_reader_survives_compact_and_refit(self, spark, tmp_path):
        import os

        IL, SIM, emb, cents, queries, path, gen = self._fixture(
            spark, str(tmp_path)
        )
        pinned_files = IL.index_log_files(path, gen)
        pinned_content = sorted(
            (r["vec_id"], r["bucket"])
            for r in IL.index_log_read(spark, path, gen).collect()
        )
        pinned_probe = sorted(map(tuple, IL.ivf_topk_generation(
            spark, path, cents, queries, k=3, nprobe=2, generation=gen
        ).collect()))
        retired, g_compact = IL.compact_index_log(spark, path, "bucket")
        assert retired > 0 and g_compact == gen + 1
        zb = spark.createDataFrame(
            [(0, 1, 0), (1, 1, 0), (2, 1, 0)],
            "bucket int, n_vectors long, mean_resid_micro long",
        )
        updated, drifted, g_refit = IL.ivf_refit_drifted_log(
            spark, path, cents, zb
        )
        assert drifted and g_refit == g_compact + 1
        # the pinned generation N view is bit-identical through both
        assert all(os.path.exists(f) for f in pinned_files)
        assert sorted(
            (r["vec_id"], r["bucket"])
            for r in IL.index_log_read(spark, path, gen).collect()
        ) == pinned_content
        assert sorted(map(tuple, IL.ivf_topk_generation(
            spark, path, cents, queries, k=3, nprobe=2, generation=gen
        ).collect())) == pinned_probe
        # no row lost at the head either
        assert IL.index_log_read(spark, path).count() == emb.count()

    def test_compaction_preserves_probe_and_collapses_files(
        self, spark, tmp_path
    ):
        IL, SIM, emb, cents, queries, path, gen = self._fixture(
            spark, str(tmp_path)
        )
        before = sorted(map(tuple, IL.ivf_topk_generation(
            spark, path, cents, queries, k=3, nprobe=2
        ).collect()))
        retired, g2 = IL.compact_index_log(spark, path, "bucket")
        assert retired > 0
        after = sorted(map(tuple, IL.ivf_topk_generation(
            spark, path, cents, queries, k=3, nprobe=2
        ).collect()))
        assert after == before
        doc = IL.index_log_doc(path, g2)
        assert all(len(fs) <= 1 for fs in doc["partitions"].values())
        # idempotent: second compact is a no-op at the same generation
        assert IL.compact_index_log(spark, path, "bucket") == (0, g2)

    def test_gc_reaps_only_unreferenced_generations(self, spark, tmp_path):
        import os

        IL, SIM, emb, cents, queries, path, gen = self._fixture(
            spark, str(tmp_path)
        )
        old_files = set(IL.index_log_files(path, gen))
        _, g2 = IL.compact_index_log(spark, path, "bucket")
        live_files = set(IL.index_log_files(path, g2))
        n = IL.index_log_gc(path, keep_last=1)
        assert n == len(old_files - live_files)
        assert all(os.path.exists(f) for f in live_files)
        assert not any(os.path.exists(f) for f in old_files - live_files)
        # current generation unaffected
        assert IL.index_log_read(spark, path).count() == emb.count()

    def test_append_retries_lost_generation_race(self, spark, tmp_path):
        import json
        import os

        IL, SIM, emb, cents, queries, path, gen = self._fixture(
            spark, str(tmp_path)
        )
        # simulate a rival winning generation gen+1: pre-publish a doc
        # carrying the current lists (a pure no-op commit)
        cur = IL.index_log_doc(path, gen)
        with open(IL._gen_file(path, gen + 1), "x") as f:
            json.dump(cur, f)
        more = SIM.assign_buckets(
            emb.select(F.col("vec_id") + 100, "embedding").toDF(
                "vec_id", "embedding"
            ).where(F.col("vec_id") % 7 == 0),
            cents,
        )
        g_new = IL.index_log_append(spark, path, more, "bucket")
        assert g_new == gen + 2  # lost the race once, retried, won next
        assert IL.index_log_read(spark, path).count() == emb.count() + more.count()

    def test_refit_drops_no_directories(self, spark, tmp_path):
        import os

        IL, SIM, emb, cents, queries, path, gen = self._fixture(
            spark, str(tmp_path)
        )
        before_files = set(IL.index_log_files(path, gen))
        zb = spark.createDataFrame(
            [(0, 1, 0), (1, 1, 0), (2, 1, 0)],
            "bucket int, n_vectors long, mean_resid_micro long",
        )
        IL.ivf_refit_drifted_log(spark, path, cents, zb)
        # additive rewrite: every pre-refit file still on disk
        assert all(os.path.exists(f) for f in before_files)
