"""BI-layer derived columns (SURVEY.md §1.3, T7/T8/T10).

These are the calculated columns the reference's Power BI model adds on
top of the fact table: which seat the tracked player occupied, who the
opponent was, and a fixed-width Elo bucket for the opponent rating.
Username comparison is case-insensitive (Chess.com usernames are).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RATING_BUCKET_WIDTH = 100


def user_color(username: Column, white_username: Column) -> Column:
    """'white' if the tracked player had the white pieces, else 'black'."""
    return F.when(F.lower(white_username) == F.lower(username), F.lit("white")).otherwise(F.lit("black"))


def opponent_username(username: Column, white_username: Column, black_username: Column) -> Column:
    return F.when(F.lower(white_username) == F.lower(username), black_username).otherwise(white_username)


def opponent_rating(username: Column, white_username: Column, white_rating: Column, black_rating: Column) -> Column:
    return F.when(F.lower(white_username) == F.lower(username), black_rating).otherwise(white_rating)


def rating_bucket(rating: Column, width: int = RATING_BUCKET_WIDTH) -> Column:
    """Fixed-width Elo bucket label, e.g. 1534 -> '1500-1599'; NULL-safe."""
    lo = (F.floor(rating / width) * width).cast("int")
    return F.when(rating.isNull(), F.lit("unrated")).otherwise(
        F.concat_ws("-", lo.cast("string"), (lo + width - 1).cast("string"))
    )


def opponent_rating_bucket(
    username: Column,
    white_username: Column,
    white_rating: Column,
    black_rating: Column,
    width: int = RATING_BUCKET_WIDTH,
) -> Column:
    return rating_bucket(opponent_rating(username, white_username, white_rating, black_rating), width)
