"""Round-10 guards: IVF-PQ cache hygiene + bounded-iteration knobs,
pq_encode passenger columns, and _rel_path cross-adapter
canonicalization (verdict-r9 asks #4/#6 + ADVICE items)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import chesscom_etl_tableau_spark.operators.similarity as SIM
from chesscom_etl_tableau_spark.plans.metadata_export import _rel_path


@pytest.fixture()
def emb160(spark):
    rows = [
        (i, [float((i * 7 + j * 13) % 19) - 9.0 for j in range(16)])
        for i in range(160)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestPqEncodeKeep:
    def test_keep_carries_passenger_columns(self, spark, emb160):
        emb = emb160.withColumn("bucket", (F.col("vec_id") % 4).cast("int"))
        books = SIM.pq_train(emb, m=4, k=4, seed=1, dim=16)
        out = SIM.pq_encode(emb, books, keep=("bucket",))
        assert out.columns == ["vec_id", "bucket", "codes"]
        got = {r["vec_id"]: r["bucket"] for r in out.collect()}
        assert got == {i: i % 4 for i in range(160)}

    def test_keep_default_unchanged(self, spark, emb160):
        books = SIM.pq_train(emb160, m=4, k=4, seed=1, dim=16)
        assert SIM.pq_encode(emb160, books).columns == ["vec_id", "codes"]


class TestIvfPqCacheHygiene:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    def test_build_releases_dataframe_cache(self, spark, emb160):
        """ivfpq_build must not pin the corpus-sized residual frame in
        the CacheManager for the session lifetime (ADVICE r9): after the
        build returns, no DataFrame-level cache entry may remain (the
        codes index is localCheckpointed at the RDD level instead, which
        the ContextCleaner releases when the frame is GC'd)."""
        # Earlier tests in the shared session may legitimately leave
        # cache entries (they recompute if re-read) — start from a
        # clean CacheManager so emptiness-after-build is attributable
        # to ivfpq_build alone.
        spark.catalog.clearCache()
        cm = spark._jsparkSession.sharedState().cacheManager()
        assert cm.isEmpty(), "cache not empty before build — test invalid"
        cents, books, index = SIM.ivfpq_build(
            emb160, nlist=4, m=4, k=4, seed=3, dim=16, corpus_rows=160
        )
        assert index.count() == 160
        assert cm.isEmpty(), "ivfpq_build leaked a DataFrame cache entry"

    def test_index_carries_bucket_without_selfjoin(self, spark, emb160):
        cents, books, index = SIM.ivfpq_build(
            emb160, nlist=4, m=4, k=4, seed=3, dim=16, corpus_rows=160
        )
        assert set(index.columns) == {"vec_id", "bucket", "codes"}
        # every vector present exactly once, bucket in range
        rows = index.collect()
        assert len(rows) == 160 and len({r["vec_id"] for r in rows}) == 160
        assert {r["bucket"] for r in rows} <= set(range(4))


class TestBoundedIterationKnobs:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    def test_max_iter_knobs_trade_cost_not_contract(self, spark, emb160):
        qs = emb160.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = SIM.ivfpq_topk(
            emb160, qs, k=3, nlist=4, m=4, kcode=8, seed=3, dim=16,
            corpus_rows=160, ivf_max_iter=2, pq_max_iter=1,
        ).collect()
        # shape contract: k rows per query, ranks 1..k, no self-match
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == {0, 1}
        for q, rows in by_q.items():
            assert sorted(r["rank"] for r in rows) == [1, 2, 3]
            assert all(r["vec_id"] != q for r in rows)

    def test_low_iter_deterministic(self, spark, emb160):
        qs = emb160.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

        def run():
            return sorted(
                map(
                    tuple,
                    SIM.ivfpq_topk(
                        emb160, qs, k=3, nlist=4, m=4, kcode=8, seed=3,
                        dim=16, corpus_rows=160, ivf_max_iter=2, pq_max_iter=1,
                    ).collect(),
                )
            )

        assert run() == run()


class TestRelPathCanonicalization:
    """Both adapters must emit identical root-relative paths for the
    same file regardless of spelling mix (ADVICE r9 medium)."""

    def test_uri_root_plain_file(self):
        assert _rel_path("file:/tmp/sink", "/tmp/sink/data/f.parquet") == "data/f.parquet"
        assert _rel_path("file:///tmp/sink", "/tmp/sink/data/f.parquet") == "data/f.parquet"

    def test_uri_root_uri_file(self):
        assert _rel_path("file:/tmp/sink", "file:/tmp/sink/data/f.parquet") == "data/f.parquet"
        assert _rel_path("file:///tmp/sink", "file:/tmp/sink/d/f.parquet") == "d/f.parquet"

    def test_plain_root_uri_file(self):
        assert _rel_path("/tmp/sink", "file:/tmp/sink/data/f.parquet") == "data/f.parquet"

    def test_plain_root_plain_file(self):
        assert _rel_path("/tmp/sink", "/tmp/sink/data/f.parquet") == "data/f.parquet"

    def test_outside_root_keeps_spelling(self):
        assert _rel_path("file:/tmp/sink", "/elsewhere/f.parquet") == "/elsewhere/f.parquet"
        assert _rel_path("/tmp/sink", "s3a://bucket/f.parquet") == "s3a://bucket/f.parquet"
        assert _rel_path("/tmp/sink", "/elsewhere/f.parquet") == "/elsewhere/f.parquet"

    def test_cross_store_path_collision_not_relativized(self):
        # ADVICE r10 medium: a file on a DIFFERENT bucket/filesystem whose
        # path component collides with the sink root must keep its
        # absolute URI — relativizing it would point Delta readers at a
        # nonexistent file under the wrong store.
        assert (
            _rel_path("s3a://bucketA/data", "s3a://bucketB/data/f.parquet")
            == "s3a://bucketB/data/f.parquet"
        )
        assert (
            _rel_path("file:/tmp/sink", "hdfs://nn/tmp/sink/x.parquet")
            == "hdfs://nn/tmp/sink/x.parquet"
        )
        assert (
            _rel_path("/tmp/sink", "hdfs://nn/tmp/sink/x.parquet")
            == "hdfs://nn/tmp/sink/x.parquet"
        )
        assert (
            _rel_path("hdfs://nn/tmp/sink", "/tmp/sink/x.parquet")
            == "/tmp/sink/x.parquet"
        )

    def test_same_store_uri_still_relativized(self):
        # Same scheme+authority: path-component match stays live.
        assert (
            _rel_path("s3a://bucket/data", "s3a://bucket/data/f.parquet")
            == "f.parquet"
        )
        assert (
            _rel_path("hdfs://nn/sink", "hdfs://NN/sink/d/f.parquet")
            == "d/f.parquet"  # authority compare is case-insensitive
        )
        assert _rel_path("file:/tmp/sink", "file://localhost/tmp/sink/f.pq") == "f.pq"
