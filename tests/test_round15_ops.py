"""Round-15 guards: durability of the streaming IVF state (advice r14
medium), the gc orphan-file horizon, the refit partition-col guard, the
ivf_path/ivf_state pair validation, and the cross-surface forget
pipeline (verdict r14 ask #1).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.test_round14_ops import GOOD_A, GOOD_B, GOOD_C, GOOD_D


class TestIvfStateDurability:
    """Advice r14 (medium): ivf_state used to live only in this
    process's memory — a stream restarted from its checkpoint got a
    fresh dict, KeyError'd at the next refit tick, and assigned
    replayed batches with pre-refit centroids. The state now
    checkpoints to generation-stamped parquet sidecars under
    `<ivf_path>/_state/` and rehydrates on first use after restart."""

    COLS = ["doc_id", "text", "lang", "source", "embedding"]

    def _cents(self, spark):
        return spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
            "centroid_id long, embedding array<double>",
        )

    def _dirs(self, tmp_path):
        return (str(tmp_path / "sink"), str(tmp_path / "lsh"),
                str(tmp_path / "reg"), str(tmp_path / "ivf"))

    def test_replay_after_restart_rehydrates_and_appends_nothing(
        self, spark, tmp_path
    ):
        from chesscom_etl_tableau_spark.operators import index_log as IL
        from chesscom_etl_tableau_spark.streaming.corpus_ingest import (
            corpus_ingest_batch,
        )

        sink, lsh, reg, ivf = self._dirs(tmp_path)
        state = {"centroids": self._cents(spark)}
        b1 = spark.createDataFrame(
            [(1, GOOD_A, "en", "s1", [0.9, 0.1, 0.0, 0.0]),
             (3, GOOD_B, "en", "s2", [0.1, 0.9, 0.0, 0.0])],
            self.COLS,
        )
        b2 = spark.createDataFrame(
            [(6, GOOD_C, "en", "s2", [0.8, 0.2, 0.0, 0.0])], self.COLS
        )
        import shutil as sh

        corpus_ingest_batch(b1, sink, lsh, reg, ivf_path=ivf, ivf_state=state)
        # crash window: snapshot the registry BEFORE batch 2 commits it,
        # so the replay recomputes b2's survivors instead of being
        # fenced out by the registry (the case where stale centroids
        # would probe the wrong buckets)
        reg_pre = str(tmp_path / "reg_pre")
        sh.copytree(reg, reg_pre)
        corpus_ingest_batch(b2, sink, lsh, reg, ivf_path=ivf, ivf_state=state)
        # RESTART: a new process sees only the caller's bootstrap
        # centroids; the replayed batch must rehydrate and no-op
        fresh = {"centroids": self._cents(spark)}
        replay = corpus_ingest_batch(
            b2, sink, lsh, reg_pre, ivf_path=ivf, ivf_state=fresh
        )
        assert replay["n_vec_appended"] == 0
        assert fresh.get("baseline") is not None  # rehydrated
        assert sorted(
            r["vec_id"] for r in IL.index_log_read(spark, ivf).collect()
        ) == [1, 3, 6]

    def test_refit_tick_after_restart_does_not_keyerror(self, spark, tmp_path):
        import time

        from chesscom_etl_tableau_spark.streaming.corpus_ingest import (
            corpus_ingest_batch,
            streaming_corpus_ingest,
        )

        sink, lsh, reg, ivf = self._dirs(tmp_path)
        state = {"centroids": self._cents(spark)}
        b1 = spark.createDataFrame(
            [(1, GOOD_A, "en", "s1", [0.9, 0.1, 0.0, 0.0]),
             (3, GOOD_B, "en", "s2", [0.1, 0.9, 0.0, 0.0])],
            self.COLS,
        )
        corpus_ingest_batch(b1, sink, lsh, reg, ivf_path=ivf, ivf_state=state)
        # RESTART: drain one more file with refit_every=1 and a state
        # dict that has never seen a bootstrap — the refit tick must
        # rehydrate (not KeyError) and the batch must key-dedup
        drop = str(tmp_path / "drop")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            [(6, GOOD_C, "en", "s2", [0.2, 0.8, 0.0, 0.0])], self.COLS
        ).coalesce(1).write.parquet(drop)
        fresh = {"centroids": self._cents(spark)}
        stats: list = []
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, source string, "
                "embedding array<double>"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        q = streaming_corpus_ingest(
            stream, sink, lsh, reg, ckpt, stats=stats,
            ivf_path=ivf, ivf_state=fresh, refit_every=1,
        )
        q.awaitTermination()
        assert stats and stats[0]["n_vec_appended"] == 1
        assert "n_drifted" in stats[0]  # the refit tick actually ran
        assert fresh.get("baseline") is not None

    def test_state_checkpoint_roundtrip_prefers_newest_complete(
        self, spark, tmp_path
    ):
        from chesscom_etl_tableau_spark.streaming.corpus_ingest import (
            _persist_ivf_state,
            _rehydrate_ivf_state,
            _state_dir,
        )

        ivf = str(tmp_path / "ivf")
        c1 = self._cents(spark)
        b1 = spark.createDataFrame(
            [(0, 2, 100), (1, 3, 200)],
            "bucket int, n_vectors long, mean_resid_micro long",
        )
        _persist_ivf_state({"centroids": c1, "baseline": b1}, ivf, 1)
        c2 = spark.createDataFrame(
            [(0, [0.5, 0.5, 0.0, 0.0])], "centroid_id long, embedding array<double>"
        )
        b2 = spark.createDataFrame(
            [(0, 5, 50)], "bucket int, n_vectors long, mean_resid_micro long"
        )
        _persist_ivf_state({"centroids": c2, "baseline": b2}, ivf, 4)
        got: dict = {}
        _rehydrate_ivf_state(spark, ivf, got)
        assert got["centroids"].count() == 1  # newest pair (gen 4) wins
        assert got["baseline"].first()["mean_resid_micro"] == 50
        # torn checkpoint (no _SUCCESS) is skipped, falls back to gen 4
        torn = os.path.join(_state_dir(ivf), "centroids-g000000000009")
        os.makedirs(torn, exist_ok=True)
        got2: dict = {}
        _rehydrate_ivf_state(spark, ivf, got2)
        assert got2["centroids"].count() == 1

    def test_ivf_path_without_state_fails_before_any_commit(
        self, spark, tmp_path
    ):
        from chesscom_etl_tableau_spark.streaming.corpus_ingest import (
            corpus_ingest_batch,
        )

        sink, lsh, reg, ivf = self._dirs(tmp_path)
        b1 = spark.createDataFrame(
            [(1, GOOD_A, "en", "s1", [0.9, 0.1, 0.0, 0.0])], self.COLS
        )
        with pytest.raises(ValueError, match="ivf_state"):
            corpus_ingest_batch(b1, sink, lsh, reg, ivf_path=ivf)
        # validated UP FRONT: nothing was committed anywhere
        assert not os.path.exists(sink) and not os.path.exists(reg)


class TestGcOrphanHorizon:
    """Advice r14: gc used to delete ANY unreferenced file — including
    one an in-flight concurrent append had written but not yet
    published. Unreferenced files younger than `min_age_sec` are now
    skipped (the Iceberg orphan-file rule)."""

    def _logged_index(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.operators import index_log as IL

        path = str(tmp_path / "idx")
        df = spark.createDataFrame(
            [(1, 0), (2, 1)], "vec_id long, bucket int"
        )
        df.write.partitionBy("bucket").parquet(path)
        IL.index_log_init(path, "bucket")
        return IL, path

    def test_young_orphan_survives_default_gc(self, spark, tmp_path):
        IL, path = self._logged_index(spark, tmp_path)
        orphan = os.path.join(path, "bucket=0", "part-orphan.parquet")
        open(orphan, "w").close()  # an in-flight append's unpublished file
        assert IL.index_log_gc(path, keep_last=1) == 0
        assert os.path.exists(orphan)

    def test_aged_orphan_is_reaped_by_default_gc(self, spark, tmp_path):
        IL, path = self._logged_index(spark, tmp_path)
        orphan = os.path.join(path, "bucket=0", "part-orphan.parquet")
        open(orphan, "w").close()
        two_days_ago = os.path.getmtime(orphan) - 2 * 86400
        os.utime(orphan, (two_days_ago, two_days_ago))
        assert IL.index_log_gc(path, keep_last=1) == 1
        assert not os.path.exists(orphan)

    def test_zero_horizon_reaps_young_orphan(self, spark, tmp_path):
        IL, path = self._logged_index(spark, tmp_path)
        orphan = os.path.join(path, "bucket=1", "part-orphan.parquet")
        open(orphan, "w").close()
        assert IL.index_log_gc(path, keep_last=1, min_age_sec=0) == 1
        assert not os.path.exists(orphan)


class TestRefitPartitionColGuard:
    def test_refit_rejects_non_bucket_partition_col(self, spark, tmp_path):
        """Advice r14: the refit's rewrite emits a literal `bucket`
        column; a log under another partition column must be rejected,
        not silently dropped from the rewrite listing."""
        from chesscom_etl_tableau_spark.operators import index_log as IL

        path = str(tmp_path / "idx")
        spark.createDataFrame(
            [(1, 0)], "doc long, pb int"
        ).write.partitionBy("pb").parquet(path)
        IL.index_log_init(path, "pb")
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0])], "centroid_id long, embedding array<double>"
        )
        base = spark.createDataFrame(
            [(0, 1, 0)], "bucket int, n_vectors long, mean_resid_micro long"
        )
        with pytest.raises(ValueError, match="partition_col"):
            IL.ivf_refit_drifted_log(spark, path, cents, base)
