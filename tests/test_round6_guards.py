"""Round-6 guards (verdict-r5 asks #3 and #4).

Ask #4 — broadcast-size fences (``plans/fence.py``): HAVING-survivor
aggregates and caller-bounded top-N lists must not bake an
``F.broadcast`` hint whose size assumption breaks at 100x. These tests
pin (a) the AQE path returns the frame unhinted so runtime stats pick
the strategy, (b) the non-AQE probe hints iff the side is provably
small, (c) the oversized fallback engages on a synthetic fixture, and
(d) both physical strategies compute identical results.

Ask #3 — ``s6_audit_game_counts`` perf: the audit sink used to
re-execute the fetched⋈appended join as a second Spark job per
archive batch; it now builds the audit frame from the already-collected
per-archive stats rows. These tests pin the observable contract: one
audit row per archive, schema-exact, one part file per run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from chesscom_etl_tableau_spark.plans.fence import (
    SURVIVOR_BROADCAST_MAX_ROWS,
    bounded_broadcast,
    fenced_broadcast,
)
from chesscom_etl_tableau_spark.operators.topk import semi_join_topn, topn_by_count
from chesscom_etl_tableau_spark.plans.ingest import ingest_archives
from chesscom_etl_tableau_spark.schemas import PROCESSED_ARCHIVES_SCHEMA


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


@pytest.fixture()
def aqe_off(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", "true")


class TestBroadcastFence:
    def test_aqe_path_returns_unhinted(self, spark):
        """Engine default (AQE on): the fence must NOT hint — AQE sizes
        the materialized stage at runtime, which beats any static
        guess. Identity return proves zero plan mutation."""
        df = spark.range(10)
        assert fenced_broadcast(df) is df

    def test_probe_hints_small_side(self, aqe_off):
        df = aqe_off.range(100)
        fenced = fenced_broadcast(df, max_rows=1000)
        assert fenced is not df
        assert "broadcast" in _analyzed(fenced).lower()

    def test_probe_falls_back_on_oversized_survivors(self, aqe_off):
        """The synthetic oversized-survivor fixture: more rows than the
        fence allows -> the hint is withheld and the planner keeps its
        own choice."""
        big = aqe_off.range(500)
        assert fenced_broadcast(big, max_rows=100) is big

    def test_both_strategies_agree(self, aqe_off):
        """Parity: the hint only steers the physical join; forcing the
        fallback (shuffle) path must give byte-identical results to the
        broadcast path on a q18-shaped survivor join."""
        fact = aqe_off.range(1000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        )
        survivors = (
            fact.groupBy("k").agg(F.sum("v").alias("s")).where(F.col("s") > 9000)
        )
        via_broadcast = (
            fact.join(fenced_broadcast(survivors, max_rows=10_000), "k")
            .groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        )
        via_shuffle = (
            fact.join(fenced_broadcast(survivors, max_rows=1), "k")
            .groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        )
        assert sorted(via_broadcast.collect()) == sorted(via_shuffle.collect())

    def test_bounded_broadcast_static_threshold(self, spark):
        """bounded_broadcast never probes: hint iff the static bound is
        under the fence."""
        df = spark.range(10)
        assert "broadcast" in _analyzed(bounded_broadcast(df, 100)).lower()
        assert bounded_broadcast(df, SURVIVOR_BROADCAST_MAX_ROWS + 1) is df

    def test_semi_join_topn_pathological_n_not_forced(self, spark):
        """J4 with a pathological top-10M request: the build side must
        not carry a forced broadcast hint; result parity with the
        small-n hinted path still holds on shared keys."""
        fact = spark.range(300).select((F.col("id") % 20).alias("k"))
        top = topn_by_count(fact, ["k"], n=5)
        hinted = semi_join_topn(fact, top, ["k"], n_bound=5)
        unforced = semi_join_topn(fact, top, ["k"], n_bound=10_000_000)
        assert "broadcast" in _analyzed(hinted).lower()
        assert "broadcast" not in _analyzed(unforced).lower()
        assert sorted(hinted.collect()) == sorted(unforced.collect())


class TestAuditSingleJob:
    def test_audit_schema_rows_and_single_file(self, spark, archives_df, tmp_path):
        """s6 fix contract: audit built from the in-hand per-archive
        stats (no second join job), schema-exact, one part file per
        ingest run, one row per archive with a real commit timestamp."""
        sink = str(tmp_path / "games")
        audit = str(tmp_path / "audit")
        ingest_archives(spark, archives_df, sink, audit_path=audit, reprocess_last=False)
        audit_df = spark.read.parquet(audit)
        # Parquet read-back normalizes nullability; names+types are the
        # schema contract.
        assert [(f.name, f.dataType) for f in audit_df.schema] == [
            (f.name, f.dataType) for f in PROCESSED_ARCHIVES_SCHEMA
        ]
        n_archives = archives_df.select("username", "archive_url").distinct().count()
        assert audit_df.count() == n_archives
        assert audit_df.where(F.col("processed_at_utc").isNull()).count() == 0
        part_files = [p for p in (tmp_path / "audit").iterdir() if p.name.startswith("part-")]
        assert len(part_files) == 1
        # Second run appends exactly one more file (all-zero counts).
        ingest_archives(spark, archives_df, sink, audit_path=audit, reprocess_last=False)
        part_files = [p for p in (tmp_path / "audit").iterdir() if p.name.startswith("part-")]
        assert len(part_files) == 2
        total = spark.read.parquet(audit).agg(F.sum("game_count")).first()[0]
        assert total == spark.read.parquet(sink).count()
