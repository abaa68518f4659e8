"""Unit tests for the scalar function layer (SURVEY.md §5.2).

PGN regex priority order, epoch edge cases, bucket boundary values,
derivation correctness — each on tiny inline DataFrames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.functions.derivations import (
    opponent_rating,
    opponent_username,
    rating_bucket,
    user_color,
)
from chesscom_etl_tableau_spark.functions.measures import draw_cond, loss_cond, win_cond
from chesscom_etl_tableau_spark.functions.pgn import game_result, pgn_eco, pgn_result
from chesscom_etl_tableau_spark.functions.time_control import time_control_bucket


def _col_vals(spark, data, schema, expr):
    df = spark.createDataFrame(data, schema)
    return [r[0] for r in df.select(expr).collect()]


class TestPgnResult:
    def test_header_beats_trailing_token(self, spark):
        # Header says 1-0, movetext ends 0-1 -> header wins (priority 1).
        pgn = '[Result "1-0"]\n1. e4 e5 0-1'
        assert _col_vals(spark, [(pgn,)], "pgn string", pgn_result(F.col("pgn"))) == ["1-0"]

    def test_last_token_wins_without_header(self, spark):
        # Multiple tokens in movetext -> LAST one (fetch_and_post.py:107-109).
        pgn = "1. e4 1-0 comment 1/2-1/2"
        assert _col_vals(spark, [(pgn,)], "pgn string", pgn_result(F.col("pgn"))) == ["1/2-1/2"]

    def test_empty_and_no_result(self, spark):
        vals = _col_vals(
            spark,
            [("",), (None,), ("1. e4 e5",)],
            "pgn string",
            pgn_result(F.col("pgn")),
        )
        assert vals == [None, None, None]

    def test_seat_fallback_and_empty_fallback(self, spark):
        # Reference semantics (fetch_and_post.py:135-144): the seat
        # fallback fires when EITHER side's result is non-empty; both
        # NULL/empty -> '' (never a bare ' / ').
        df = spark.createDataFrame(
            [
                ("1. e4", "win", "timeout"),
                ("1. e4", None, "timeout"),  # one-sided: still falls back
                ("1. e4", "win", ""),
                ("1. e4", None, None),
                ("1. e4", "", ""),
            ],
            "pgn string, wr string, br string",
        )
        vals = [
            r[0]
            for r in df.select(game_result(F.col("pgn"), F.col("wr"), F.col("br"))).collect()
        ]
        assert vals == ["win / timeout", " / timeout", "win / ", "", ""]

    def test_token_word_boundaries(self, spark):
        # Reference fidelity (fetch_and_post.py:107 uses \b...\b): a result
        # string that is a prefix/suffix of a longer token run is NOT a
        # result. "x11-0" / "1-00" / "21-0" must not extract; a properly
        # delimited token still does.
        vals = _col_vals(
            spark,
            [
                ("1. Rb1 x11-0",),
                ("1. e4 1-00",),
                ("...Rb1 21-0",),
                ("1. e4 1-0",),
                ("(1-0)",),  # punctuation is a boundary, like the reference
            ],
            "pgn string",
            pgn_result(F.col("pgn")),
        )
        assert vals == [None, None, None, "1-0", "1-0"]

    def test_header_whitespace_and_strip(self, spark):
        # Reference fidelity (fetch_and_post.py:102-104): the header regex
        # is \[Result\s+"([^"]+)"\] — ANY whitespace run after the tag
        # name matches — and the captured value is .strip()ed. A
        # whitespace-only value still MATCHES the header, so it blocks the
        # movetext token fallthrough (the reference returns inside `if m:`)
        # and strips to empty -> NULL here.
        vals = _col_vals(
            spark,
            [
                ('[Result  "1-0"] 1. e4',),  # two spaces after tag
                ('[Result\t"0-1"] 1. e4',),  # tab after tag
                ('[Result \t "1/2-1/2"] 1. e4',),  # mixed whitespace run
                ('[Result "1-0 "] 1. e4',),  # trailing space in value
                ('[Result " 0-1"] 1. e4',),  # leading space in value
                ('[Result "  "] 1. e4 e5 1-0',),  # ws-only: blocks token
            ],
            "pgn string",
            pgn_result(F.col("pgn")),
        )
        assert vals == ["1-0", "0-1", "1/2-1/2", "1-0", "0-1", None]

    def test_header_whitespace_matches_reference(self, spark):
        # The Python reference itself, run over the same boundary inputs —
        # the rebuild's NULL plays the reference's '' (falsy) role.
        import re

        def ref_parse(pgn):  # fetch_and_post.py:90-111, verbatim semantics
            if not pgn:
                return ""
            m = re.search(r'\[Result\s+"([^"]+)"\]', pgn)
            if m:
                return m.group(1).strip()
            tokens = re.findall(r"\b(1-0|0-1|1/2-1/2)\b", pgn)
            if tokens:
                return tokens[-1].strip()
            return ""

        cases = [
            '[Result  "1-0"] 1. e4',
            '[Result\t"0-1"] 1. e4',
            '[Result \t "1/2-1/2"] x',
            '[Result "1-0 "] 1. e4',
            '[Result " 0-1"] 1. e4',
            '[Result "  "] 1. e4 e5 1-0',
            '[Result "1-0"]\n1. e4 0-1',
            "1. e4 1-0 adj 0-1",
            "1. e4 e5",
            "",
        ]
        got = _col_vals(spark, [(c,) for c in cases], "pgn string", pgn_result(F.col("pgn")))
        assert [g if g is not None else "" for g in got] == [ref_parse(c) for c in cases]

    def test_eco(self, spark):
        vals = _col_vals(
            spark,
            [('[ECO "B20"]\n1. e4',), ("1. e4",), (None,)],
            "pgn string",
            pgn_eco(F.col("pgn")),
        )
        assert vals == ["B20", None, None]


class TestTimeControlBucket:
    def test_buckets_and_boundaries(self, spark):
        cases = {
            "60": "bullet",
            "179": "bullet",
            "180": "blitz",  # boundary: 180 is blitz
            "300+2": "blitz",
            "599": "blitz",
            "600": "rapid",
            "900+10": "rapid",
            "1799": "rapid",
            "1800": "classical",
            "1/86400": "daily",
            "garbage": "unknown",
            None: "unknown",
        }
        vals = _col_vals(
            spark,
            [(k,) for k in cases],
            "tc string",
            time_control_bucket(F.col("tc")),
        )
        assert vals == list(cases.values())


class TestDerivations:
    def test_user_color_case_insensitive(self, spark):
        df = spark.createDataFrame(
            [("Player0", "player0", "opp"), ("player0", "opp", "PLAYER0")],
            "username string, w string, b string",
        )
        vals = [
            tuple(r)
            for r in df.select(
                user_color(F.col("username"), F.col("w")),
                opponent_username(F.col("username"), F.col("w"), F.col("b")),
            ).collect()
        ]
        assert vals == [("white", "opp"), ("black", "opp")]

    def test_opponent_rating_and_bucket(self, spark):
        df = spark.createDataFrame(
            [("u", "u", 1500, 1534), ("u", "o", 1666, 1500)],
            "username string, w string, wr int, br int",
        )
        vals = [
            r[0]
            for r in df.select(
                opponent_rating(F.col("username"), F.col("w"), F.col("wr"), F.col("br"))
            ).collect()
        ]
        assert vals == [1534, 1666]
        assert _col_vals(spark, [(1534,), (None,), (99,)], "r int", rating_bucket(F.col("r"))) == [
            "1500-1599",
            "unrated",
            "0-99",
        ]


class TestMeasureConds:
    def test_win_loss_draw(self, spark):
        df = spark.createDataFrame(
            [("1-0", "white"), ("1-0", "black"), ("0-1", "black"), ("1/2-1/2", "white"), ("", "white")],
            "result string, color string",
        )
        out = df.select(
            win_cond(F.col("result"), F.col("color")).alias("w"),
            loss_cond(F.col("result"), F.col("color")).alias("l"),
            draw_cond(F.col("result")).alias("d"),
        ).collect()
        assert [(r["w"], r["l"], r["d"]) for r in out] == [
            (True, False, False),
            (False, True, False),
            (True, False, False),
            (False, False, True),
            (False, False, False),
        ]
