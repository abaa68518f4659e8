"""Round-9 guard tests.

Pins the capped-training contract (VERDICT r8 ask #4): IVF centroid and
PQ codebook fitting must read a bounded, deterministic hash-sample of
the corpus — the full-corpus `KMeans.fit` was the last unbounded scan
in the ANN family — and the embedding-dimension probe must be skippable
via an explicit `dim` from catalog metadata (no driver-side `.first()`
in plan-build paths).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

import chesscom_etl_tableau_spark.operators.similarity as SIM


@pytest.fixture(scope="module")
def emb500(spark):
    rng = random.Random(9)
    rows = [
        (i, [float(rng.gauss(i % 4, 0.5)) for _ in range(8)]) for i in range(500)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


class TestTrainSample:
    def test_deterministic_and_bounded(self, emb500):
        s1 = SIM.train_sample(emb500, cap=50, corpus_rows=500, key_col="vec_id")
        s2 = SIM.train_sample(emb500, cap=50, corpus_rows=500, key_col="vec_id")
        ids1 = sorted(r["vec_id"] for r in s1.select("vec_id").collect())
        ids2 = sorted(r["vec_id"] for r in s2.select("vec_id").collect())
        assert ids1 == ids2  # content-hash selection, not rng
        # stride = ceil(500/50) = 10 -> keep ~= Binomial(500, 1/10);
        # bounds generous enough to never flake, tight enough to prove
        # the cap engaged.
        assert 10 <= len(ids1) <= 150

    def test_passthrough_under_cap_and_disabled(self, emb500):
        assert SIM.train_sample(emb500, cap=500, corpus_rows=500).count() == 500
        assert SIM.train_sample(emb500, cap=0, corpus_rows=500).count() == 500

    def test_hashes_vector_when_no_key(self, emb500):
        # No id column required: the default key is the vector itself.
        vecs = emb500.select("embedding")
        cnt = SIM.train_sample(vecs, cap=50, corpus_rows=500).count()
        assert 10 <= cnt <= 150

    def test_sample_is_scan_only(self, emb500):
        # The sample is a pushed-down filter on the scan: no shuffle,
        # no sort, no rng tied to partition layout.
        plan = SIM.train_sample(
            emb500, cap=50, corpus_rows=500, key_col="vec_id"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_lazy_with_catalog_rows(self, spark, emb500):
        # With corpus_rows from catalog stats, building the sample plan
        # runs zero Spark jobs (the count fallback is the only job).
        sc = spark.sparkContext
        group = "r9-train-sample-lazy"
        sc.setJobGroup(group, "train_sample must be lazy")
        try:
            SIM.train_sample(emb500, cap=50, corpus_rows=500, key_col="vec_id")
        finally:
            sc.setJobGroup(None, None)
        assert list(sc.statusTracker().getJobIdsForGroup(group)) == []


class TestCappedTraining:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    def test_pq_train_capped_shapes_and_quality(self, emb500):
        books = SIM.pq_train(
            emb500, m=4, k=8, seed=42, dim=8, train_cap=64, corpus_rows=500
        )
        assert len(books) == 4
        assert all(len(b) == 8 for b in books)
        assert all(len(c) == 2 for b in books for c in b)
        err = SIM.pq_reconstruction_error(emb500, books)
        rows = err.collect()
        assert len(rows) == 500
        assert all(r["sq_error"] >= 0.0 for r in rows)
        # Capped codebooks must still beat the 1-centroid quantizer
        # (per-dim variance sum) on clusterable data.
        import statistics

        data = {r["vec_id"]: r["sq_error"] for r in rows}
        assert statistics.mean(data.values()) < 8 * 4.0  # 4 clusters span ~[0,3]

    def test_pq_train_dim_param_matches_sniff(self, emb500):
        # Under the cap the sample is the corpus, so passing dim (the
        # catalog path) must reproduce the sniffing path bit-for-bit.
        a = SIM.pq_train(emb500, m=4, k=4, seed=1, dim=8)
        b = SIM.pq_train(emb500, m=4, k=4, seed=1)
        assert a == b

    def test_pq_train_deterministic_when_capped(self, emb500):
        a = SIM.pq_train(emb500, m=4, k=4, seed=1, dim=8, train_cap=64, corpus_rows=500)
        b = SIM.pq_train(emb500, m=4, k=4, seed=1, dim=8, train_cap=64, corpus_rows=500)
        assert a == b

    def test_ivf_centroids_capped_cover_corpus(self, emb500):
        cents = SIM.ivf_build_centroids(
            emb500, nlist=4, seed=7, train_cap=64, corpus_rows=500
        )
        assert cents.count() == 4
        assigned = SIM.assign_buckets(emb500, cents, "vec_id", "embedding")
        got = assigned.where(F.col("bucket").isNotNull()).count()
        assert got == 500  # sampled training still buckets every vector

    def test_whitening_dim_param(self, emb500):
        # dim from catalog metadata: contract booleans still hold and no
        # first-row probe is needed.
        row = SIM.whitening_contract(emb500, dim=8).collect()[0]
        assert row["dim"] == 8
        assert row["mean_is_zero"] and row["cov_is_identity"]


class TestIvfPq:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    def _clusters(self, spark, n_per=40, d=16):
        import random

        rng = random.Random(21)
        rows = []
        for i in range(4 * n_per):
            c = i % 4
            center = [5.0 * (1 if (c >> b) & 1 else -1) for b in range(2)] * (d // 2)
            rows.append((i, [float(center[j] + rng.gauss(0, 0.3)) for j in range(d)]))
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def test_build_shapes(self, spark):
        df = self._clusters(spark)
        cents, books, index = SIM.ivfpq_build(
            df, nlist=4, m=4, k=8, seed=3, dim=16, corpus_rows=160
        )
        assert cents.count() == 4
        assert len(books) == 4 and all(len(b) == 8 for b in books)
        assert all(len(c) == 4 for b in books for c in b)  # dsub = 16/4
        rows = index.collect()
        assert len(rows) == 160
        assert all(len(r["codes"]) == 4 for r in rows)

    def test_neighbors_come_from_query_cluster(self, spark):
        df = self._clusters(spark)
        qs = df.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = SIM.ivfpq_topk(
            df, qs, k=5, nprobe=1, nlist=4, m=4, kcode=8, seed=3,
            dim=16, corpus_rows=160,
        ).collect()
        assert len(out) == 5
        # query 0 lives in cluster 0 (i % 4): refined neighbors too
        assert all(r["vec_id"] % 4 == 0 for r in out)

    def test_deterministic(self, spark):
        df = self._clusters(spark)
        qs = df.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        a = sorted(map(tuple, SIM.ivfpq_topk(df, qs, k=3, nlist=4, m=4, kcode=8, seed=3, dim=16, corpus_rows=160).collect()))
        b = sorted(map(tuple, SIM.ivfpq_topk(df, qs, k=3, nlist=4, m=4, kcode=8, seed=3, dim=16, corpus_rows=160).collect()))
        assert a == b

    def test_refine_is_exact_on_candidates(self, spark):
        # with nprobe == nlist every vector is a candidate, so IVFPQ
        # with a generous refine must equal the exact scan
        df = self._clusters(spark)
        qs = df.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = sorted(
            (r["query_id"], r["vec_id"])
            for r in SIM.cosine_topk(df, qs, k=3).collect()
        )
        got = sorted(
            (r["query_id"], r["vec_id"])
            for r in SIM.ivfpq_topk(
                df, qs, k=3, nprobe=4, nlist=4, m=4, kcode=8,
                refine_factor=40, seed=3, dim=16, corpus_rows=160,
            ).collect()
        )
        assert got == exact


class TestIvfPqPersisted:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    def test_pruned_probe_matches_inmemory(self, spark, tmp_path):
        import random

        rng = random.Random(11)
        rows = [
            (i, [float(rng.gauss(i % 4, 0.3)) for _ in range(8)]) for i in range(80)
        ]
        corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        qs = corpus.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        path = str(tmp_path / "ivfpq_index")
        cents, books = SIM.ivfpq_persist(
            corpus, path, nlist=4, m=4, k=8, seed=5, dim=8, corpus_rows=80
        )
        got = SIM.ivfpq_topk_persisted(
            spark, path, cents, books, corpus, qs, k=3, nprobe=2
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        # the code-table scan is partition-pruned on bucket
        assert "PartitionFilters" in plan
        assert "bucket" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
        expect = sorted(
            map(
                tuple,
                SIM.ivfpq_topk(
                    corpus, qs, k=3, nprobe=2, nlist=4, m=4, kcode=8,
                    seed=5, dim=8, corpus_rows=80,
                ).collect(),
            )
        )
        assert sorted(map(tuple, got.collect())) == expect
