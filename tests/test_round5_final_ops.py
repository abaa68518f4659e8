"""Semantic guards for the round-5 final operators: SCD Type-2
dimension build, reciprocal-rank-fusion hybrid retrieval, and the
relational data-quality report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.quality_checks import dq_report
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


class TestDqReport:
    def _dirty(self, spark):
        rows = [
            (1, "O", 10.0, "HIGH", "2024-01-05 00:00:00", 100),
            (1, "O", 20.0, None, "2024-01-06 00:00:00", 100),  # dup key, null prio
            (2, "X", -5.0, "LOW", "2024-01-07 00:00:00", 999),  # bad status/neg/orphan
            (3, None, 30.0, "LOW", "2024-01-08 00:00:00", 101),  # null status
        ]
        df = spark.createDataFrame(
            rows, "k long, status string, amt double, prio string, ts string, fk long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        dim = spark.createDataFrame([(100,), (101,)], "pk long")
        return df, dim

    def test_detects_every_violation_class(self, spark):
        df, dim = self._dirty(spark)
        rep = {
            r["rule"]: r
            for r in dq_report(
                df,
                unique_keys=["k"],
                accepted_values={"status": ["O", "F", "P"]},
                non_negative=["amt"],
                max_null_rate={"prio": 0.1},
                references=[("fk", dim, "pk")],
                fresh_after={"ts": "2024-02-01"},
            ).collect()
        }
        assert len(rep) == 6
        assert rep["unique:k"]["metric"] == 1.0 and not rep["unique:k"]["passed"]
        # bad value AND null both count as accepted-set violations
        assert rep["accepted:status"]["metric"] == 2.0
        assert rep["non_negative:amt"]["metric"] == 1.0
        assert rep["null_rate:prio"]["metric"] == 0.25
        assert not rep["null_rate:prio"]["passed"]  # 0.25 > 0.1
        assert rep["references:fk->pk"]["metric"] == 1.0
        # max(ts) is before the bound -> stale -> fail
        assert rep["fresh_after:ts"]["metric"] < 0
        assert not rep["fresh_after:ts"]["passed"]
        assert all(not r["passed"] for r in rep.values())

    def test_clean_data_all_pass(self, spark):
        df, dim = self._dirty(spark)
        clean = df.where((F.col("k") != 1) & (F.col("fk") != 999) & F.col("status").isNotNull())
        rep = dq_report(
            clean,
            unique_keys=["k"],
            non_negative=["k"],
            max_null_rate={"prio": 0.5},
            references=[("fk", dim, "pk")],
            fresh_after={"ts": "2024-01-01"},
        )
        assert rep.where(~F.col("passed")).count() == 0

    def test_row_level_rules_fuse_into_one_scan(self, spark):
        df, _ = self._dirty(spark)
        rep = dq_report(
            df,
            unique_keys=["k"],
            accepted_values={"status": ["O"]},
            non_negative=["amt"],
            max_null_rate={"prio": 0.9},
            fresh_after={"ts": "2020-01-01"},
        )
        # 5 row-level rules, ONE pass over the source: a union of
        # per-rule projections would rescan per rule (measured 5x);
        # the explode form must keep exactly one aggregate pipeline.
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ExistingRDD") == 1  # the source, once
        # one aggregate pipeline: partial+final, doubled by the
        # countDistinct two-phase expansion — but never 5 rescans
        assert plan.count("HashAggregate") <= 4
        assert rep.count() == 5

    def test_requires_rules(self, spark):
        df, _ = self._dirty(spark)
        with pytest.raises(ValueError):
            dq_report(df)


class TestScd2ApplyChanges:
    def _feed(self, spark, rows):
        return _changes(spark, rows)

    def test_equals_full_rebuild(self, spark):
        from chesscom_etl_tableau_spark.operators.scd import (
            scd2_apply_changes,
            scd2_build,
        )

        rows = [
            ("u", "A", 1), ("u", "A", 2), ("u", "B", 3),   # batch 1
            ("u", "B", 10), ("u", "C", 11), ("u", "B", 12),  # batch 2
            ("v", "X", 2),                                  # batch-1-only key
            ("w", "N", 10), ("w", "M", 12),                 # batch-2-only key
        ]
        ch = self._feed(spark, rows)
        cutoff = F.lit("2024-01-09").cast("timestamp")
        d1 = scd2_build(ch.where(F.col("ts") < cutoff), "k", "attr", "ts", ("seq",))
        inc = scd2_apply_changes(
            d1, ch.where(F.col("ts") >= cutoff), "k", "attr", "ts", ("seq",)
        )
        full = scd2_build(ch, "k", "attr", "ts", ("seq",))
        a = sorted(map(tuple, inc.collect()))
        b = sorted(map(tuple, full.collect()))
        assert a == b

    def test_run_extension_is_noop(self, spark):
        from chesscom_etl_tableau_spark.operators.scd import (
            scd2_apply_changes,
            scd2_build,
        )

        ch = self._feed(spark, [("u", "A", 1), ("u", "B", 3)])
        d1 = scd2_build(ch, "k", "attr", "ts", ("seq",))
        ext = self._feed(spark, [("u", "B", 10), ("u", "B", 11)])
        out = scd2_apply_changes(d1, ext, "k", "attr", "ts", ("seq",))
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, d1.collect())
        )

    def test_closed_history_untouched_and_not_rescanned(self, spark):
        from chesscom_etl_tableau_spark.operators.scd import (
            scd2_apply_changes,
            scd2_build,
        )

        ch = self._feed(
            spark, [("u", "A", 1), ("u", "B", 2), ("u", "C", 3), ("z", "Z", 1)]
        )
        d1 = scd2_build(ch, "k", "attr", "ts", ("seq",))
        batch = self._feed(spark, [("u", "D", 10)])
        out = scd2_apply_changes(d1, batch, "k", "attr", "ts", ("seq",))
        hist = {
            (r["k"], r["version"]): (r["attr"], str(r["effective_from"]), str(r["effective_to"]))
            for r in out.where(~F.col("is_current")).collect()
        }
        orig = {
            (r["k"], r["version"]): (r["attr"], str(r["effective_from"]), str(r["effective_to"]))
            for r in d1.collect()
        }
        # versions 1-2 of u are byte-identical to before; version 3 (was
        # open) is now closed at the batch ts; z untouched and still open
        assert hist[("u", 1)] == orig[("u", 1)]
        assert hist[("u", 2)] == orig[("u", 2)]
        assert hist[("u", 3)][2] == "2024-01-10 00:00:00"
        cur = {r["k"]: r for r in out.where(F.col("is_current")).collect()}
        assert cur["u"]["attr"] == "D" and cur["u"]["version"] == 4
        assert cur["z"]["attr"] == "Z" and cur["z"]["version"] == 1


class TestGroupedRrf:
    def test_per_query_fusion_independent(self, spark):
        # two queries share doc ids; fusion and top-k are per-query
        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (2, 10, 1)],
            "query_id long, doc_id long, rank int",
        )
        b = spark.createDataFrame(
            [(1, 11, 1), (2, 12, 1)], "query_id long, doc_id long, rank int"
        )
        out = rrf_fuse(
            [("a", a), ("b", b)], top_k=1, group_cols=("query_id",)
        ).collect()
        best = {r["query_id"]: r for r in out}
        assert len(out) == 2  # exactly one winner per query
        # q1: doc 11 in both lists (1/62 + 1/61) beats doc 10 (1/61)
        assert best[1]["doc_id"] == 11
        # q2: docs 10 and 12 tie at 1/61 -> doc_id tiebreak
        assert best[2]["doc_id"] == 10

    def test_grouped_matches_ungrouped_for_single_group(self, spark):
        a = _ranked(spark, [(1, 1), (2, 2)])
        b = _ranked(spark, [(2, 1), (3, 2)])
        plain = rrf_fuse([("a", a), ("b", b)], top_k=3).collect()
        ga = a.withColumn("q", F.lit(0))
        gb = b.withColumn("q", F.lit(0))
        grouped = rrf_fuse(
            [("a", ga), ("b", gb)], top_k=3, group_cols=("q",)
        ).drop("q").collect()
        assert sorted(map(tuple, plain)) == sorted(map(tuple, grouped))


class TestStreamingDqGate:
    def test_per_batch_reports(self, spark, tmp_path):
        import json

        from chesscom_etl_tableau_spark.streaming.dq_stream import (
            streaming_dq_gate,
        )

        drop = tmp_path / "in"
        drop.mkdir()
        # batch 1 clean, batch 2 carries a dup key and a negative amount
        (drop / "b1.json").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    {"k": 1, "amt": 5.0},
                    {"k": 2, "amt": 7.0},
                ]
            )
        )
        stream = spark.readStream.schema("k long, amt double").json(str(drop))
        q = streaming_dq_gate(
            stream,
            str(tmp_path / "report"),
            str(tmp_path / "ckpt"),
            {"unique_keys": ["k"], "non_negative": ["amt"]},
        )
        q.awaitTermination(120)
        (drop / "b2.json").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    {"k": 3, "amt": -1.0},
                    {"k": 3, "amt": 2.0},
                ]
            )
        )
        q2 = streaming_dq_gate(
            stream,
            str(tmp_path / "report"),
            str(tmp_path / "ckpt"),
            {"unique_keys": ["k"], "non_negative": ["amt"]},
        )
        q2.awaitTermination(120)
        rep = spark.read.parquet(str(tmp_path / "report"))
        rows = {
            (r["batch_id"], r["rule"]): r for r in rep.collect()
        }
        batches = sorted({b for b, _ in rows})
        assert len(batches) == 2  # checkpoint resumed, batch 1 not re-audited
        b1, b2 = batches
        assert rows[(b1, "unique:k")]["passed"]
        assert rows[(b1, "non_negative:amt")]["passed"]
        assert rows[(b2, "unique:k")]["metric"] == 1.0
        assert not rows[(b2, "unique:k")]["passed"]
        assert rows[(b2, "non_negative:amt")]["metric"] == 1.0
        assert not rows[(b2, "non_negative:amt")]["passed"]
