"""Semantic guards for the round-5 final operators: SCD Type-2
dimension build and reciprocal-rank-fusion hybrid retrieval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.retrieval import hybrid_topk, rrf_fuse
from chesscom_etl_tableau_spark.operators.scd import END_OF_TIME, scd2_build


def _changes(spark, rows):
    return spark.createDataFrame(
        [(k, a, f"2024-01-{d:02d} 00:00:00", i) for i, (k, a, d) in enumerate(rows)],
        "k string, attr string, ts string, seq long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestScd2:
    def test_closed_form(self, spark):
        # u: A A B A  -> 3 versions (the repeat A at d2 collapses)
        # v: X        -> 1 open version
        ch = _changes(
            spark,
            [("u", "A", 1), ("u", "A", 2), ("u", "B", 3), ("u", "A", 4), ("v", "X", 1)],
        )
        out = {
            (r["k"], r["version"]): r
            for r in scd2_build(ch, "k", "attr", "ts", ("seq",)).collect()
        }
        assert len(out) == 4
        u1, u2, u3 = out[("u", 1)], out[("u", 2)], out[("u", 3)]
        assert (u1["attr"], u2["attr"], u3["attr"]) == ("A", "B", "A")
        # half-open intervals chain exactly
        assert u1["effective_to"] == u2["effective_from"]
        assert u2["effective_to"] == u3["effective_from"]
        assert str(u3["effective_to"]) == END_OF_TIME
        assert [u1["is_current"], u2["is_current"], u3["is_current"]] == [
            False,
            False,
            True,
        ]
        assert out[("v", 1)]["is_current"]

    def test_null_attr_forms_own_run(self, spark):
        # null-safe change detection: A, null, null, A -> 3 versions
        ch = _changes(spark, [("u", "A", 1), ("u", None, 2), ("u", None, 3), ("u", "A", 4)])
        rows = sorted(
            scd2_build(ch, "k", "attr", "ts", ("seq",)).collect(),
            key=lambda r: r["version"],
        )
        assert [r["attr"] for r in rows] == ["A", None, "A"]

    def test_ts_tie_breaks_on_order_col(self, spark):
        # same-ts observations order by seq: B (seq later) wins the run
        ch = _changes(spark, [("u", "A", 1), ("u", "B", 1)])
        rows = sorted(
            scd2_build(ch, "k", "attr", "ts", ("seq",)).collect(),
            key=lambda r: r["version"],
        )
        assert [r["attr"] for r in rows] == ["A", "B"]
        assert rows[1]["is_current"]

    def test_invariants_on_testdata(self, spark):
        from chesscom_etl_tableau_spark.sources.tables import load_table

        ev = (
            load_table(spark, "/root/testdata/sf0.001", "events")
            .where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
            .select(
                "user_id",
                F.floor(F.col("value") / 25).cast("int").alias("tier"),
                "ts",
                "event_id",
            )
        )
        dim = scd2_build(ev, "user_id", "tier", "ts", ("event_id",))
        # exactly one open version per key; versions consecutive from 1;
        # adjacent versions never share a tier; intervals chain.
        bad = (
            dim.groupBy("user_id")
            .agg(
                F.sum(F.col("is_current").cast("int")).alias("n_open"),
                F.max("version").alias("vmax"),
                F.count(F.lit(1)).alias("n"),
            )
            .where((F.col("n_open") != 1) | (F.col("vmax") != F.col("n")))
            .count()
        )
        assert bad == 0
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("version")
        chain = dim.select(
            "user_id",
            "tier",
            "version",
            "effective_from",
            "effective_to",
            F.lead("effective_from").over(w).alias("next_from"),
            F.lead("tier").over(w).alias("next_tier"),
        )
        assert chain.where(
            F.col("next_from").isNotNull()
            & (F.col("effective_to") != F.col("next_from"))
        ).count() == 0
        assert chain.where(
            F.col("next_tier").isNotNull() & (F.col("tier") == F.col("next_tier"))
        ).count() == 0


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


class TestRrf:
    def test_closed_form_scores(self, spark):
        a = _ranked(spark, [(1, 1), (2, 2)])
        b = _ranked(spark, [(2, 1), (3, 2)])
        out = {r["doc_id"]: r for r in rrf_fuse([("a", a), ("b", b)], top_k=10).collect()}
        # doc 2 in both lists: 1/62 + 1/61; docs 1 and 3 single-list
        assert out[2]["rrf_score"] == pytest.approx(
            round(1 / 62 + 1 / 61, 6), abs=2e-6
        )
        assert out[1]["rrf_score"] == pytest.approx(round(1 / 61, 6), abs=2e-6)
        assert out[1]["b_rank"] == 0 and out[3]["a_rank"] == 0
        # both-lists doc dominates single-list docs
        assert out[2]["rrf_score"] > out[1]["rrf_score"] > 0

    def test_requires_two_rankers(self, spark):
        with pytest.raises(ValueError):
            rrf_fuse([("a", _ranked(spark, [(1, 1)]))])

    def test_three_ranker_fusion(self, spark):
        lists = [
            ("a", _ranked(spark, [(1, 1)])),
            ("b", _ranked(spark, [(1, 2)])),
            ("c", _ranked(spark, [(1, 3), (9, 1)])),
        ]
        out = {r["doc_id"]: r for r in rrf_fuse(lists, top_k=5).collect()}
        assert out[1]["rrf_score"] == pytest.approx(
            round(1 / 61 + 1 / 62 + 1 / 63, 6), abs=2e-6
        )
        assert set(out) == {1, 9}

    def test_hybrid_on_testdata_deterministic(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        r1 = hybrid_topk(docs, emb, ["spark", "join", "window"]).collect()
        r2 = hybrid_topk(docs, emb, ["spark", "join", "window"]).collect()
        assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
        assert 0 < len(r1) <= 10
        # scores are sorted desc with doc_id tiebreak, every rank >= 0,
        # and at least one doc carries BOTH ranks at this corpus size
        scores = [(-r["rrf_score"], r["doc_id"]) for r in r1]
        assert scores == sorted(scores)
        assert all(r["bm25_rank"] >= 0 and r["cos_rank"] >= 0 for r in r1)
