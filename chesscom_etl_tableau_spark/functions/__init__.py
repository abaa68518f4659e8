"""Scalar column expressions (all JVM-side builtins, no Python UDFs).

Every function here returns a ``pyspark.sql.Column`` so it stays inside
whole-stage codegen. The reference implements the same logic as
row-at-a-time Python (fetch_and_post.py:90-161); re-expressing it as
Catalyst expressions is what makes it viable at 100 TB.
"""

from chesscom_etl_tableau_spark.functions.pgn import pgn_eco, pgn_result, game_result
from chesscom_etl_tableau_spark.functions.time_control import time_control_bucket
from chesscom_etl_tableau_spark.functions.derivations import (
    opponent_rating,
    opponent_rating_bucket,
    opponent_username,
    user_color,
)
from chesscom_etl_tableau_spark.functions.measures import (
    draw_cond,
    loss_cond,
    measure_exprs,
    win_cond,
)

__all__ = [
    "pgn_eco",
    "pgn_result",
    "game_result",
    "time_control_bucket",
    "user_color",
    "opponent_username",
    "opponent_rating",
    "opponent_rating_bucket",
    "win_cond",
    "loss_cond",
    "draw_cond",
    "measure_exprs",
]
