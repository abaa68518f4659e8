"""Round-5 late-session operators: triangle counting, prefix-blocked
edit-distance dedup, EWMA smoothing, LOCF gap fill, observed metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.components import triangle_count
from chesscom_etl_tableau_spark.operators.dedup import prefix_edit_pairs
from chesscom_etl_tableau_spark.operators.quality_checks import observe_metrics
from chesscom_etl_tableau_spark.operators.windows import ewma, gap_fill_locf


class TestTriangleCount:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_k4_every_node_in_three_triangles(self, spark):
        nodes = ["a", "b", "c", "d"]
        e = self._edges(
            spark,
            [(u, v) for u in nodes for v in nodes if u < v],
        )
        got = {r["node"]: r["n_triangles"] for r in triangle_count(e).collect()}
        assert got == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_chain_has_no_triangles(self, spark):
        e = self._edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert triangle_count(e).count() == 0

    def test_direction_and_duplicates_irrelevant(self, spark):
        # triangle a-b-c given as mixed directions + dups + self loop
        messy = self._edges(
            spark,
            [("a", "b"), ("b", "a"), ("c", "b"), ("a", "c"),
             ("a", "c"), ("c", "c")],
        )
        clean = self._edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        assert sorted(map(tuple, triangle_count(messy).collect())) == sorted(
            map(tuple, triangle_count(clean).collect())
        )

    def test_hub_graph_counts_each_triangle_once(self, spark):
        # hub h connected to x1..x4, plus edge x1-x2: exactly 1 triangle
        e = self._edges(
            spark,
            [("h", f"x{i}") for i in range(1, 5)] + [("x1", "x2")],
        )
        got = {r["node"]: r["n_triangles"] for r in triangle_count(e).collect()}
        assert got == {"h": 1, "x1": 1, "x2": 1}


class TestPrefixEditPairs:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_near_dup_found_far_pair_rejected(self, spark):
        base = "the quick brown fox jumps over the lazy dog " + "x" * 60
        near = base.replace("lazy", "hazy")  # 1 edit, same prefix
        far = "the quick brown fox jumps " + "z" * 80  # same 5-token prefix
        d = self._docs(spark, [(1, base), (2, near), (3, far)])
        rows = prefix_edit_pairs(d).collect()
        assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
        assert rows[0]["edit_dist"] == 1

    def test_different_prefix_blocks_no_candidates(self, spark):
        # identical tails but different openings: blocked apart (the
        # documented recall boundary of prefix blocking)
        d = self._docs(
            spark,
            [(1, "alpha beta gamma delta epsilon SAME TAIL"),
             (2, "one two three four five SAME TAIL")],
        )
        assert prefix_edit_pairs(d).count() == 0

    def test_oversized_block_fenced(self, spark):
        rows = [(i, "common opening words here now tail%d" % i)
                for i in range(10)]
        d = self._docs(spark, rows)
        assert prefix_edit_pairs(d, max_block=5).count() == 0
        assert prefix_edit_pairs(d, max_block=64).count() > 0

    def test_relative_threshold_integer_cut(self, spark):
        # len 100, 10% => dist 10 passes, dist 11 fails
        t0 = "p q r s t " + "a" * 90
        t_ok = "p q r s t " + "a" * 80 + "b" * 10
        t_no = "p q r s t " + "a" * 79 + "b" * 11
        d = self._docs(spark, [(1, t0), (2, t_ok), (3, t_no)])
        pairs = {(r["id_a"], r["id_b"]): r["edit_dist"]
                 for r in prefix_edit_pairs(d).collect()}
        assert (1, 2) in pairs and pairs[(1, 2)] == 10
        assert (1, 3) not in pairs


class TestEwma:
    def test_matches_closed_form(self, spark):
        vals = [10.0, 20.0, 15.0, 30.0]
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "k string, i long, value double",
        )
        got = {
            r["i"]: r["ewma"]
            for r in ewma(df, "k", ("i",), "value", 30, 8).collect()
        }
        a = 0.3
        for i in range(len(vals)):
            num = sum((1 - a) ** k * vals[i - k] for k in range(0, min(i + 1, 8)))
            den = sum((1 - a) ** k for k in range(0, min(i + 1, 8)))
            assert got[i] == pytest.approx(num / den, rel=1e-12)

    def test_horizon_truncates(self, spark):
        # a huge value `horizon` rows back must have rolled out
        vals = [1e9] + [1.0] * 8
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "k string, i long, value double",
        )
        got = ewma(df, "k", ("i",), "value", 30, 8).orderBy("i").collect()
        assert got[-1]["ewma"] == pytest.approx(1.0)
        assert got[-2]["ewma"] > 1.0  # spike still inside the window


class TestGapFillLocf:
    def test_fills_gaps_with_last_observation(self, spark):
        df = spark.createDataFrame(
            [("u", "2024-01-01 05:00:00", 10.0),
             ("u", "2024-01-04 07:00:00", 40.0)],
            "user_id string, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        rows = (
            gap_fill_locf(df, "user_id", "ts", "value", step="1 day")
            .orderBy("tick")
            .collect()
        )
        assert [r["value_filled"] for r in rows] == [10.0, 10.0, 10.0, 40.0]
        assert [r["is_observed"] for r in rows] == [True, False, False, True]
        assert rows[0]["tick"].hour == 0  # grid is day-truncated

    def test_multiple_obs_in_tick_latest_wins(self, spark):
        df = spark.createDataFrame(
            [("u", "2024-01-01 05:00:00", 1.0),
             ("u", "2024-01-01 09:00:00", 2.0)],
            "user_id string, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        rows = gap_fill_locf(df, "user_id", "ts", "value", step="1 day").collect()
        assert len(rows) == 1 and rows[0]["value_filled"] == 2.0

    def test_keys_do_not_leak(self, spark):
        df = spark.createDataFrame(
            [("u1", "2024-01-01 01:00:00", 5.0),
             ("u2", "2024-01-03 01:00:00", 7.0)],
            "user_id string, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = gap_fill_locf(df, "user_id", "ts", "value", step="1 day")
        # u2 starts two days later: no u2 ticks before its first obs,
        # and u1's value never appears under u2
        u2 = out.where(F.col("user_id") == "u2").collect()
        assert len(u2) == 1 and u2[0]["value_filled"] == 7.0


class TestObserveMetrics:
    def test_metrics_ride_along_with_action(self, spark):
        df = spark.range(100).withColumn(
            "v", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
        )
        observed, obs = observe_metrics(
            df,
            "t",
            {"n": F.count(F.lit(1)), "nulls": F.sum(F.col("v").isNull().cast("long"))},
        )
        assert observed.count() == 100
        assert obs.get == {"n": 100, "nulls": 10}


class TestBasketLift:
    def test_closed_form(self, spark):
        # baskets: {a,b} x3, {a,c} x1, {b,c} x1, {d} alone; N=6
        rows = []
        for i, items in enumerate(
            [["a", "b"], ["a", "b"], ["a", "b"], ["a", "c"], ["b", "c"], ["d"]]
        ):
            rows += [(i, it) for it in items]
        df = spark.createDataFrame(rows, "b long, i string")
        from chesscom_etl_tableau_spark.operators.analytics import basket_lift

        got = {
            (r["item_a"], r["item_b"]): (r["support"], r["lift"])
            for r in basket_lift(df, "b", "i", min_support=2).collect()
        }
        # only (a,b) reaches support 2; lift = 3*6/(4*4) = 1.125
        assert got == {("a", "b"): (3, 1.125)}

    def test_repeat_items_in_basket_count_once(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")], "b long, i string"
        )
        from chesscom_etl_tableau_spark.operators.analytics import basket_lift

        rows = basket_lift(df, "b", "i", min_support=2).collect()
        assert len(rows) == 1 and rows[0]["support"] == 2


class TestTrendSlope:
    def test_exact_line(self, spark):
        # value = 2*day + 5 -> slope 2.0 per day
        base = "2024-01-0{d} 00:00:00"
        df = spark.createDataFrame(
            [("u", base.format(d=d), float(2 * d + 5)) for d in range(1, 6)],
            "user_id string, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        from chesscom_etl_tableau_spark.operators.analytics import trend_slope

        r = trend_slope(df, "user_id", "ts", "value").first()
        assert r["n_points"] == 5
        assert r["slope_per_day"] == pytest.approx(2.0)

    def test_degenerate_keys_null(self, spark):
        df = spark.createDataFrame(
            [("one", "2024-01-01 00:00:00", 3.0),
             ("same_ts", "2024-01-02 00:00:00", 1.0),
             ("same_ts", "2024-01-02 00:00:00", 9.0)],
            "user_id string, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        from chesscom_etl_tableau_spark.operators.analytics import trend_slope

        got = {r["user_id"]: r["slope_per_day"]
               for r in trend_slope(df, "user_id", "ts", "value").collect()}
        assert got == {"one": None, "same_ts": None}


class TestTableDiff:
    def test_statuses(self, spark):
        from chesscom_etl_tableau_spark.operators.quality_checks import table_diff

        left = spark.createDataFrame(
            [(1, "x", 1.0), (2, "y", 2.0), (3, "z", None)],
            "k long, s string, v double",
        )
        right = spark.createDataFrame(
            [(1, "x", 1.0), (2, "y", 9.0), (4, "w", 4.0)],
            "k long, s string, v double",
        )
        got = {r["k"]: r["diff_status"]
               for r in table_diff(left, right, ["k"]).collect()}
        assert got == {2: "changed", 3: "removed", 4: "added"}

    def test_null_vs_null_is_equal(self, spark):
        from chesscom_etl_tableau_spark.operators.quality_checks import table_diff

        df = spark.createDataFrame([(1, None)], "k long, v double")
        assert table_diff(df, df, ["k"]).count() == 0


class TestSkewReport:
    def test_uniform_gini_zero(self, spark):
        from chesscom_etl_tableau_spark.operators.skew import skew_report

        df = spark.createDataFrame(
            [(k, i) for k in "abcd" for i in range(5)], "k string, i long"
        )
        rows = skew_report(df, ["k"], top_k=2).collect()
        assert len(rows) == 2
        assert all(r["gini"] == 0.0 for r in rows)
        assert all(r["share"] == 0.25 for r in rows)
        assert rows[0]["n_keys"] == 4

    def test_skewed_key_dominates(self, spark):
        from chesscom_etl_tableau_spark.operators.skew import skew_report

        rows = [("hot", i) for i in range(97)] + [("a", 0), ("b", 0), ("c", 0)]
        df = spark.createDataFrame(rows, "k string, i long")
        top = skew_report(df, ["k"], top_k=1).collect()[0]
        assert top["k"] == "hot" and top["share"] == 0.97
        # Gini for counts [1,1,1,97]: 2*(1+2+3+4*97)/(4*100) - 5/4 = 0.72
        assert top["gini"] == pytest.approx(0.72)


class TestWinsorize:
    def test_clips_to_exact_band(self, spark):
        from chesscom_etl_tableau_spark.operators.training import winsorize

        # 11 values 0..100 step 10: p05 = 5.0, p95 = 95.0 (interpolated)
        df = spark.createDataFrame(
            [("g", float(10 * i)) for i in range(11)], "g string, v double"
        )
        got = {r["v"]: (r["v_winsorized"], r["was_clipped"])
               for r in winsorize(df, "g", "v").collect()}
        assert got[0.0] == (5.0, True)
        assert got[100.0] == (95.0, True)
        assert got[50.0] == (50.0, False)

    def test_groups_independent(self, spark):
        from chesscom_etl_tableau_spark.operators.training import winsorize

        df = spark.createDataFrame(
            [("small", float(i)) for i in range(11)]
            + [("big", float(1000 * i)) for i in range(11)],
            "g string, v double",
        )
        out = winsorize(df, "g", "v")
        big_max = out.where("g = 'big'").agg(F.max("v_winsorized")).first()[0]
        assert big_max == 9500.0  # big group's own p95, not small's


class TestSequenceNgrams:
    def test_paths_counted_within_key_only(self, spark):
        from chesscom_etl_tableau_spark.operators.analytics import sequence_ngrams

        rows = [
            ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"), ("u1", 4, "b"),
            ("u2", 1, "b"), ("u2", 2, "c"),  # only 2 events: no trigram
        ]
        df = spark.createDataFrame(rows, "u string, i long, t string")
        got = {r["path"]: r["n_occurrences"]
               for r in sequence_ngrams(df, "u", ["i"], "t", n=3).collect()}
        # u1 has trigrams a>b>c and b>c>b; u2's pair never bridges users
        assert got == {"a>b>c": 1, "b>c>b": 1}

    def test_bigram_mode_and_topk_order(self, spark):
        from chesscom_etl_tableau_spark.operators.analytics import sequence_ngrams

        rows = [("u", i, t) for i, t in enumerate(["x", "y", "x", "y", "x"])]
        df = spark.createDataFrame(rows, "u string, i long, t string")
        top = sequence_ngrams(df, "u", ["i"], "t", n=2, top_k=2).collect()
        assert [(r["path"], r["n_occurrences"]) for r in top] == [
            ("x>y", 2), ("y>x", 2),
        ]


class TestMmrRerank:
    def _emb(self, spark):
        # 0: query-ish anchor; 1,2 near-identical high-rel pair; 3 distinct
        vecs = {
            1: [1.0, 0.0, 0.0],
            2: [0.999, 0.045, 0.0],
            3: [0.0, 1.0, 0.0],
            4: [0.0, 0.0, 1.0],
        }
        return spark.createDataFrame(
            [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
        )

    def test_diversity_beats_redundancy(self, spark):
        from chesscom_etl_tableau_spark.operators.similarity import mmr_rerank

        cands = spark.createDataFrame(
            [(1, 0.95), (2, 0.94), (3, 0.80), (4, 0.50)],
            "vec_id long, cosine_sim double",
        )
        out = mmr_rerank(cands, self._emb(spark), k=3).orderBy("rank").collect()
        picks = [r["vec_id"] for r in out]
        # pure relevance would pick 1,2,3; MMR penalizes 2 (≈copy of 1)
        assert picks == [1, 3, 2]
        assert out[0]["mmr_score"] == pytest.approx(0.7 * 0.95)

    def test_k_capped_by_candidates(self, spark):
        from chesscom_etl_tableau_spark.operators.similarity import mmr_rerank

        cands = spark.createDataFrame(
            [(1, 0.9), (3, 0.8)], "vec_id long, cosine_sim double"
        )
        out = mmr_rerank(cands, self._emb(spark), k=10).collect()
        assert len(out) == 2
        assert sorted(r["rank"] for r in out) == [1, 2]
