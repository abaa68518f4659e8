"""Top-k, windows, date-dim, schema enforcement unit tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.date_dim import build_date_dim, date_dim_for, join_date_dim
from chesscom_etl_tableau_spark.operators.topk import semi_join_topn, topk_keys, topn_by_count
from chesscom_etl_tableau_spark.operators.windows import rolling_ratio_by_day
from chesscom_etl_tableau_spark.schemas import GAMES_SCHEMA, SchemaMismatchError, enforce_schema


class TestTopK:
    def test_deterministic_tie_break(self, spark):
        df = spark.createDataFrame(
            [("a",), ("a",), ("b",), ("b",), ("c",)], "k string"
        )
        out = topn_by_count(df, ["k"], 1).collect()
        assert out[0]["k"] == "a"  # tie a/b at 2 -> key asc wins

    def test_semi_join_restricts(self, spark):
        df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3), ("c", 4)], "k string, v int")
        topn = topn_by_count(df, ["k"], 1)
        out = semi_join_topn(df, topn, ["k"]).collect()
        assert {r["k"] for r in out} == {"a"}
        assert len(out) == 2


class TestRollingWindow:
    def test_range_frame_on_sparse_days(self, spark):
        rows = [
            ("2024-01-01", "w"),
            ("2024-01-05", "l"),
            ("2024-01-30", "w"),  # gap >12d: window restarts
        ]
        df = spark.createDataFrame(rows, "d string, r string").withColumn("d", F.to_date("d"))
        out = {str(r["day"]): r for r in rolling_ratio_by_day(df, "d", F.col("r") == "w", days=12).collect()}
        assert out["2024-01-05"]["roll_den"] == 2  # includes Jan 1 (4 days back)
        assert out["2024-01-30"]["roll_den"] == 1  # excludes everything
        assert out["2024-01-30"]["roll_ratio"] == 1.0

    def test_partitioned(self, spark):
        rows = [("u1", "2024-01-01"), ("u2", "2024-01-01"), ("u2", "2024-01-02")]
        df = spark.createDataFrame(rows, "u string, d string").withColumn("d", F.to_date("d"))
        out = rolling_ratio_by_day(df, "d", F.lit(True), days=12, partition_cols=["u"]).collect()
        by = {(r["u"], str(r["day"])): r["roll_den"] for r in out}
        assert by[("u2", "2024-01-02")] == 2
        assert by[("u1", "2024-01-01")] == 1


class TestDateDim:
    def test_contiguous_span(self, spark):
        dim = build_date_dim(spark, "2024-01-30", "2024-02-02").collect()
        assert [str(r["date"]) for r in dim] == ["2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"]
        assert dim[0]["year"] == 2024 and dim[0]["month"] == 1 and dim[0]["day"] == 30

    def test_dim_for_df_and_join(self, spark):
        df = spark.createDataFrame([("2024-03-01",), ("2024-03-05",)], "d string").withColumn(
            "d", F.to_date("d")
        )
        dim = date_dim_for(df, "d")
        assert dim.count() == 5  # every day incl. zero-activity days
        joined = join_date_dim(df, dim, "d")
        assert joined.where(F.col("year").isNull()).count() == 0


class TestSchemaEnforcement:
    def test_reorders_columns(self, spark):
        cols = [f.name for f in GAMES_SCHEMA.fields]
        df = spark.createDataFrame([], GAMES_SCHEMA).select(*reversed(cols))
        out = enforce_schema(df, GAMES_SCHEMA)
        assert out.columns == cols

    def test_rejects_drift(self, spark):
        df = spark.createDataFrame([], GAMES_SCHEMA).drop("pgn")
        with pytest.raises(SchemaMismatchError):
            enforce_schema(df, GAMES_SCHEMA)
        df2 = spark.createDataFrame([], GAMES_SCHEMA).withColumn("extra", F.lit(1))
        with pytest.raises(SchemaMismatchError):
            enforce_schema(df2, GAMES_SCHEMA)


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        from chesscom_etl_tableau_spark.operators.sessions import session_stats, sessionize

        rows = [
            ("u1", 1, "2024-01-01 10:00:00"),
            ("u1", 2, "2024-01-01 10:10:00"),   # same session (10 min)
            ("u1", 3, "2024-01-01 11:00:00"),   # 50-min gap -> new session
            ("u2", 4, "2024-01-01 10:05:00"),   # separate user
        ]
        df = spark.createDataFrame(rows, "user_id string, event_id int, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        s = {r["event_id"]: r["session_seq"] for r in sessionize(df, 30, tiebreak_cols=("event_id",)).collect()}
        assert s == {1: 1, 2: 1, 3: 2, 4: 1}

        stats = {
            (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_s"])
            for r in session_stats(df, 30, tiebreak_cols=("event_id",)).collect()
        }
        assert stats[("u1", 1)] == (2, 600)
        assert stats[("u1", 2)] == (1, 0)
        assert stats[("u2", 1)] == (1, 0)

    def test_single_window_node(self, spark):
        """Both window functions share one sort/shuffle (same spec)."""
        from chesscom_etl_tableau_spark.operators.sessions import sessionize

        df = spark.createDataFrame(
            [("u", 1, "2024-01-01 10:00:00")], "user_id string, event_id int, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        plan = sessionize(df, 30, tiebreak_cols=("event_id",))._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window") <= 2  # lag window + running-sum window, no extra exchanges
        assert plan.count("Exchange") == 1, plan


class TestSqlSurface:
    def test_views_queryable(self, spark):
        from chesscom_etl_tableau_spark.sources.views import register_views

        register_views(spark, "/root/testdata/sf0.001", ("orders", "customer"))
        n = spark.sql(
            "SELECT count(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        ).first()["n"]
        assert n > 0
