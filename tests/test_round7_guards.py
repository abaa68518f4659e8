"""Round-7 hardening guards: the batch-CEP hot-key fence, key-type
derivation, whitening rank-deficiency rejection, and the metadata
export's local-filesystem assertion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.analytics import pattern_matches

STEPS = ("signup", "view", "purchase")


class TestCepHotKeyFence:
    def _events(self, spark, n_for_user1: int):
        rows = [(i, 1, f"2024-01-01T10:{i % 60:02d}:{i % 60:02d}", "view") for i in range(n_for_user1)]
        rows += [
            (1000, 2, "2024-01-01T10:00:00", "signup"),
            (1001, 2, "2024-01-01T10:01:00", "view"),
            (1002, 2, "2024-01-01T10:02:00", "purchase"),
        ]
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string"
        ).select(
            "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
        )

    def test_hot_key_raises_with_streaming_pointer(self, spark):
        ev = self._events(spark, n_for_user1=40)
        with pytest.raises(ValueError) as exc:
            pattern_matches(ev, STEPS, within_minutes=60, max_events_per_key=10)
        msg = str(exc.value)
        assert "max_events_per_key=10" in msg
        assert "streaming_pattern_matches" in msg
        assert "1(40)" in msg  # names the offending key and its count

    def test_fence_disabled_and_default_pass(self, spark):
        ev = self._events(spark, n_for_user1=40)
        got = {r["user_id"] for r in pattern_matches(ev, STEPS, max_events_per_key=None).collect()}
        assert got == {2}
        # the documented default (10M) never trips on sane data
        got2 = {r["user_id"] for r in pattern_matches(ev, STEPS).collect()}
        assert got2 == {2}

    def test_string_keys_are_first_class(self, spark):
        # ADVICE r6: the output key column derives its type from the
        # input schema instead of a hard-coded long
        rows = [
            (1, "alice", "2024-01-01T10:00:00", "signup"),
            (2, "alice", "2024-01-01T10:01:00", "view"),
            (3, "alice", "2024-01-01T10:02:00", "purchase"),
            (4, "bob", "2024-01-01T10:00:00", "signup"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id string, ts string, event_type string"
        ).select(
            "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
        )
        out = pattern_matches(ev, STEPS, within_minutes=60)
        assert out.schema["user_id"].dataType.simpleString() == "string"
        assert {r["user_id"] for r in out.collect()} == {"alice"}


class TestWhiteningRankGuards:
    def test_fewer_vectors_than_dims_rejected(self, spark):
        from chesscom_etl_tableau_spark.operators.similarity import whiten_embeddings

        rows = [(i, [float(i), float(i * 2), 1.0, 0.5]) for i in range(4)]  # n == dim
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="rank-deficient"):
            whiten_embeddings(emb)

    def test_collinear_embeddings_rejected(self, spark):
        from chesscom_etl_tableau_spark.operators.similarity import whiten_embeddings

        # 100 copies of one direction: cov has a zero eigenvalue
        rows = [(i, [float(i % 7), float(2 * (i % 7))]) for i in range(100)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="singular"):
            whiten_embeddings(emb)


class TestMetadataExportLocalOnly:
    def test_remote_uri_rejected(self, spark):
        from chesscom_etl_tableau_spark.plans.metadata_export import snapshot_summaries

        with pytest.raises(ValueError, match="local-filesystem"):
            snapshot_summaries(spark, "s3a://bucket/sink")

    def test_local_paths_still_fine(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.plans.metadata_export import snapshot_summaries

        assert snapshot_summaries(spark, str(tmp_path / "never_published")) == []
