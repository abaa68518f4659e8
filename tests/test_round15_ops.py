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


class TestForgetPipeline:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    """Verdict r15 ask #1: one removal request applied across corpus
    manifest + LSH index + IVF index under a write-ahead intent — a
    crash between surfaces heals on resume, pinned pre-delete
    generations stay readable as the audit surface, and a replay
    publishes nothing anywhere."""

    COLS = ["doc_id", "text", "lang", "source"]

    def _fixture(self, spark, tmp_path):
        from tests.test_round14_ops import GOOD_A, GOOD_B, GOOD_C, GOOD_D
        from chesscom_etl_tableau_spark.operators import index_log as IL
        from chesscom_etl_tableau_spark.operators.dedup import lsh_band_rows
        from chesscom_etl_tableau_spark.operators.similarity import ivf_persist
        from chesscom_etl_tableau_spark.plans.ingest import (
            commit_append_manifest,
        )

        corpus, lsh, ivf = (
            str(tmp_path / "corpus"), str(tmp_path / "lsh"), str(tmp_path / "ivf")
        )
        docs = spark.createDataFrame(
            [(1, GOOD_A, "en", "s1"), (2, GOOD_B, "en", "s1"),
             (3, GOOD_C, "en", "s2"), (4, GOOD_D, "en", "s2")],
            self.COLS,
        )
        commit_append_manifest(docs, corpus, key_col="doc_id")
        lsh_band_rows(docs).write.partitionBy("pb").parquet(lsh)
        IL.index_log_init(lsh, "pb")
        vecs = docs.select(
            F.col("doc_id").alias("vec_id"),
            F.array(
                (F.col("doc_id") % 2).cast("double"),
                ((F.col("doc_id") + 1) % 2).cast("double"),
            ).alias("embedding"),
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "centroid_id long, embedding array<double>",
        )
        ivf_persist(vecs, cents, ivf)
        IL.index_log_init(ivf, "bucket")
        return IL, corpus, lsh, ivf, docs

    def _counts(self, spark, IL, corpus, lsh, ivf, victims):
        from chesscom_etl_tableau_spark.plans.ingest import read_manifest_sink

        vset = set(victims)
        c = read_manifest_sink(spark, corpus)
        return (
            sum(r["doc_id"] in vset for r in c.collect()) if c is not None else 0,
            IL.index_log_read(spark, lsh)
            .where(F.col("doc").isin(victims)).count(),
            IL.index_log_read(spark, ivf)
            .where(F.col("vec_id").isin(victims)).count(),
        )

    def test_forget_applies_everywhere_and_replay_publishes_nothing(
        self, spark, tmp_path
    ):
        from chesscom_etl_tableau_spark.plans import forget as FG
        from chesscom_etl_tableau_spark.plans.ingest import read_manifest_sink

        IL, corpus, lsh, ivf, docs = self._fixture(spark, tmp_path)
        victims = [2, 3]
        ids = spark.createDataFrame([(v,) for v in victims], "doc_id long")
        res = FG.forget_ids(ids, corpus, lsh_path=lsh, ivf_path=ivf)
        assert res["deleted"]["corpus"] == 2
        assert res["deleted"]["lsh"] > 0 and res["deleted"]["ivf"] == 2
        assert self._counts(spark, IL, corpus, lsh, ivf, victims) == (0, 0, 0)
        # the audit surface: every surface's pinned PRE generation
        # still serves the forgotten ids
        pre = res["pre"]
        assert IL.index_log_read(spark, lsh, pre["lsh"]).where(
            F.col("doc").isin(victims)
        ).count() > 0
        assert IL.index_log_read(spark, ivf, pre["ivf"]).where(
            F.col("vec_id").isin(victims)
        ).count() == 2
        from chesscom_etl_tableau_spark.plans.ingest import read_manifest_pruned
        pre_corpus = spark.read.parquet(
            *__import__(
                "chesscom_etl_tableau_spark.plans.ingest", fromlist=["x"]
            )._manifest_doc(corpus, pre["corpus"])["files"]
        )
        assert pre_corpus.where(F.col("doc_id").isin(victims)).count() == 2
        # replay: publishes NOTHING on any surface
        res2 = FG.forget_ids(ids, corpus, lsh_path=lsh, ivf_path=ivf)
        assert res2["deleted"] == {"corpus": 0, "lsh": 0, "ivf": 0}
        assert res2["post"] == res["post"]
        assert res2["intent"] == res["intent"] + 1
        # the audit record of WHAT was asked survives both intents
        assert sorted(
            r["doc_id"]
            for r in FG.forget_audit_ids(spark, corpus, res["intent"]).collect()
        ) == victims

    def test_crash_between_surfaces_heals_on_resume(
        self, spark, tmp_path, monkeypatch
    ):
        from chesscom_etl_tableau_spark.operators import index_log as ILmod
        from chesscom_etl_tableau_spark.plans import forget as FG

        IL, corpus, lsh, ivf, docs = self._fixture(spark, tmp_path)
        victims = [1, 4]
        ids = spark.createDataFrame([(v,) for v in victims], "doc_id long")
        real = ILmod.index_log_delete_ids

        def boom(*a, **k):
            raise RuntimeError("injected crash after the corpus delete")

        monkeypatch.setattr(ILmod, "index_log_delete_ids", boom)
        with pytest.raises(RuntimeError, match="injected"):
            FG.forget_ids(ids, corpus, lsh_path=lsh, ivf_path=ivf)
        monkeypatch.setattr(ILmod, "index_log_delete_ids", real)
        # torn state: corpus deleted, indexes not — and the fence says
        # so: the intent is PENDING (no done doc), so a fence-following
        # reader uses the PRE generations, where every surface still
        # shows the ids (no generation SET ever shows a partial delete)
        n = FG.forget_pending(corpus)
        assert len(n) == 1
        assert self._counts(spark, IL, corpus, lsh, ivf, victims)[0] == 0
        assert self._counts(spark, IL, corpus, lsh, ivf, victims)[1] > 0
        pre = FG.forget_doc(corpus, n[0])["pre"]
        assert IL.index_log_read(spark, lsh, pre["lsh"]).where(
            F.col("doc").isin(victims)
        ).count() > 0
        # resume completes the remaining surfaces idempotently
        completed = FG.forget_resume(spark, corpus)
        assert completed == n
        assert self._counts(spark, IL, corpus, lsh, ivf, victims) == (0, 0, 0)
        done = FG.forget_done_doc(corpus, n[0])
        assert done is not None and done["resumed"] is True
        assert done["deleted"]["corpus"] == 0  # already gone: no republish
        assert done["deleted"]["ivf"] == 2
        # second resume: nothing pending
        assert FG.forget_resume(spark, corpus) == []

    def test_intent_numbers_serialize(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.plans import forget as FG

        IL, corpus, lsh, ivf, docs = self._fixture(spark, tmp_path)
        a = FG.forget_ids(
            spark.createDataFrame([(1,)], "doc_id long"), corpus
        )
        b = FG.forget_ids(
            spark.createDataFrame([(2,)], "doc_id long"), corpus
        )
        assert (a["intent"], b["intent"]) == (1, 2)
        assert FG.forget_intents(corpus) == [1, 2]


class TestStreamingAnnEnrich:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    """Verdict r15 ask #5: per-batch generation pinning — a mid-drain
    compaction advances the generation between batches but can never
    tear a batch, and content invariance makes the union of batch
    outputs equal a fresh probe of the final generation."""

    def test_mid_drain_compaction_does_not_tear_batches(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.operators import index_log as IL
        from chesscom_etl_tableau_spark.operators.similarity import (
            assign_buckets,
            ivf_persist,
        )
        from chesscom_etl_tableau_spark.streaming.ann_enrich import (
            streaming_ann_enrich,
        )

        ivf = str(tmp_path / "ivf")
        drop = str(tmp_path / "drop")
        sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
        vecs = spark.createDataFrame(
            [(i, [1.0 - 0.01 * i, 0.01 * i]) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "centroid_id long, embedding array<double>",
        )
        base = vecs.where(F.col("vec_id") % 2 == 0)
        extra = vecs.where(F.col("vec_id") % 2 == 1)
        ivf_persist(base, cents, ivf)
        IL.index_log_init(ivf, "bucket")
        IL.index_log_append(spark, ivf, assign_buckets(extra, cents), "bucket")
        queries = vecs.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        queries.where(F.col("query_id") < 2).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
        import time

        time.sleep(0.05)
        queries.where(F.col("query_id") >= 2).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
        stats: list = []
        stream = (
            spark.readStream.schema("query_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        q = streaming_ann_enrich(
            stream, ivf, cents, sink, ckpt, k=3, nprobe=1,
            compact_every=1, stats=stats,
        )
        q.awaitTermination()
        assert len(stats) == 2
        gens = [s["generation"] for s in stats]
        assert gens[1] > gens[0]  # batch 2 served the compacted gen
        got = spark.read.parquet(sink)
        assert sorted(
            r["generation"] for r in got.select("generation").distinct().collect()
        ) == gens
        static = IL.ivf_topk_generation(
            spark, ivf, cents, queries, k=3, nprobe=1
        )
        sel = got.select("query_id", "vec_id", "cosine_sim", "rank")
        assert (
            sel.exceptAll(static).count() + static.exceptAll(sel).count()
        ) == 0


class TestStreamDecontam:
    """Verdict r15 ask #8: the decontamination screen drops a
    benchmark-contained survivor before any commit, is a pure function
    of (batch, vocab) — replays recompute the identical drop — and
    leaves the unrelated survivors untouched."""

    COLS = ["doc_id", "text", "lang", "source"]

    def test_contaminated_survivor_dropped_and_replay_identical(
        self, spark, tmp_path
    ):
        from chesscom_etl_tableau_spark.plans.ingest import read_manifest_sink
        from chesscom_etl_tableau_spark.streaming.corpus_ingest import (
            benchmark_shingle_vocab,
            corpus_ingest_batch,
        )

        sink, lsh, reg = (
            str(tmp_path / "sink"), str(tmp_path / "lsh"), str(tmp_path / "reg")
        )
        bench = spark.createDataFrame([(900, GOOD_A, "en", "bench")], self.COLS)
        vocab = benchmark_shingle_vocab(bench).localCheckpoint()
        b1 = spark.createDataFrame(
            [(1, GOOD_A, "en", "s1"),  # identical to the benchmark doc
             (2, GOOD_B, "en", "s1")],
            self.COLS,
        )
        stats = corpus_ingest_batch(
            b1, sink, lsh, reg, decontam_vocab=vocab
        )
        assert stats["n_dropped_contaminated"] == 1
        assert stats["n_published"] == 1
        kept = sorted(
            r["doc_id"] for r in read_manifest_sink(spark, sink).collect()
        )
        assert kept == [2]
        # replay with a fresh registry (the pre-commit crash window):
        # identical outcome, nothing new published anywhere
        replay = corpus_ingest_batch(
            b1, sink, lsh, str(tmp_path / "reg2"), decontam_vocab=vocab
        )
        assert replay["n_dropped_contaminated"] == 1
        assert replay["n_published"] == 0  # keyed-idempotent
        assert sorted(
            r["doc_id"] for r in read_manifest_sink(spark, sink).collect()
        ) == [2]

    def test_no_vocab_means_no_decontam_path(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.streaming.corpus_ingest import (
            corpus_ingest_batch,
        )

        sink, lsh, reg = (
            str(tmp_path / "sink"), str(tmp_path / "lsh"), str(tmp_path / "reg")
        )
        b1 = spark.createDataFrame([(1, GOOD_A, "en", "s1")], self.COLS)
        stats = corpus_ingest_batch(b1, sink, lsh, reg)
        assert stats["n_dropped_contaminated"] == 0
        assert stats["n_published"] == 1


class TestWinnowVectorizedEquivalence:
    """Optimization r15: winnow_fingerprints moved its rolling-hash /
    window-min stages from interpreted Catalyst HOF lambdas to
    vectorized numpy inside one mapInPandas stage. The math is exact
    int64 mod arithmetic in both forms; this pins the multiset
    equality against the retained expression implementation."""

    def test_numpy_winnow_equals_expression_winnow(self, spark):
        from chesscom_etl_tableau_spark.operators.text import (
            winnow_fingerprints,
            winnow_fingerprints_expr,
        )

        docs = spark.createDataFrame(
            [
                (1, "The quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox JUMPS over the lazy dog!!"),
                (3, "short"),
                (4, None),
                (5, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
                (6, "numbers 12345 and symbols @#$ mix 67890 here"),
                (7, "tiny"),  # shorter than k after normalization
            ],
            "doc_id long, text string",
        )
        a = sorted(
            (r["doc_id"], r["fingerprint"])
            for r in winnow_fingerprints(docs).collect()
        )
        b = sorted(
            (r["doc_id"], r["fingerprint"])
            for r in winnow_fingerprints_expr(docs).collect()
        )
        assert a == b
        assert len(a) > 0


class TestMapInPandasCarryAcrossBatches:
    """Optimization r15: pattern_matches and cusum_changepoints moved
    from one-Python-call-per-key applyInPandas to partition-sorted
    mapInPandas with matcher/recurrence state carried across Arrow
    batch boundaries. With maxRecordsPerBatch=2 a single key's history
    is guaranteed to straddle batches — results must equal the
    whole-group semantics."""

    def _with_tiny_batches(self, spark):
        return spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")

    def test_pattern_match_spans_batch_boundary(self, spark):
        from datetime import datetime, timezone

        from chesscom_etl_tableau_spark.operators.analytics import (
            pattern_matches,
        )

        def ts(m):
            return datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc).replace(
                tzinfo=None
            )

        rows = [
            (1, "view", ts(0), 1),
            (1, "cart", ts(1), 2),
            (1, "purchase", ts(2), 3),
            (1, "view", ts(10), 4),
            (1, "cart", ts(11), 5),
            (1, "purchase", ts(12), 6),
            (2, "view", ts(0), 7),
            (2, "purchase", ts(1), 8),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp, event_id long"
        )
        prev = self._with_tiny_batches(spark)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        try:
            got = sorted(
                (r["user_id"], r["duration_s"])
                for r in pattern_matches(
                    df, ["view", "cart", "purchase"], within_minutes=30,
                    max_events_per_key=None,
                ).collect()
            )
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", prev
            )
        # user 1 completes the pattern twice; user 2 never does
        assert got == [(1, 120.0), (1, 120.0)]

    def test_cusum_state_spans_batch_boundary(self, spark):
        from datetime import datetime, timezone

        from chesscom_etl_tableau_spark.operators.analytics import (
            cusum_changepoints,
        )

        def ts(m):
            return datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc).replace(
                tzinfo=None
            )

        # 5 consecutive +100-above-target values: s_pos accumulates
        # 75e6 per event (target 50, slack 25) and crosses 200e6 on the
        # 3rd — state must survive the 2-row batch splits to fire.
        rows = [(7, ts(i), 150.0, i) for i in range(5)]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double, event_id long"
        )
        prev = self._with_tiny_batches(spark)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        try:
            got = [
                (r["user_id"], r["direction"], r["stat"])
                for r in cusum_changepoints(
                    df, target=50.0, slack=25.0, threshold=200.0,
                    max_events_per_key=None,
                ).orderBy("change_ts").collect()
            ]
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", prev
            )
        assert got == [(7, "up", 225.0)]
