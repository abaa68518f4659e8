"""The BI measure layer (SURVEY.md §2.4, A1-A12) as reusable expressions.

Every measure is a Column expression, so any grouping/filter context
(slicers, cross-filtering, Top-N) composes with them exactly like the
reference's DAX filter context does: filters become WHERE conjuncts,
the visual's grouping becomes groupBy, and the measures are evaluated
in a single `agg()` pass (measure fusion, A12 — Spark computes all of
them in one shuffle with map-side partial aggregation).

Win/loss semantics (inferred, SURVEY.md §2.4 A2/A3): the tracked player
wins when (result='1-0' and they were white) or (result='0-1' and they
were black); draws are result='1/2-1/2'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def win_cond(result: Column, color: Column) -> Column:
    return ((result == "1-0") & (color == "white")) | ((result == "0-1") & (color == "black"))


def loss_cond(result: Column, color: Column) -> Column:
    return ((result == "0-1") & (color == "white")) | ((result == "1-0") & (color == "black"))


def draw_cond(result: Column) -> Column:
    return result == "1/2-1/2"


def measure_exprs(result: Column, color: Column) -> dict[str, Column]:
    """A1-A5 as named aggregate expressions for one-pass `agg(*exprs)`."""
    wins = F.count_if(win_cond(result, color))
    losses = F.count_if(loss_cond(result, color))
    draws = F.count_if(draw_cond(result))
    total = F.count(F.lit(1))
    return {
        "total_games": total.alias("total_games"),
        "total_wins": wins.alias("total_wins"),
        "total_losses": losses.alias("total_losses"),
        "total_draws": draws.alias("total_draws"),
        "win_pct": F.round(F.try_divide(wins, total), 6).alias("win_pct"),
    }
