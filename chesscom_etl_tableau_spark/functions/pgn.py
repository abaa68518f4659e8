"""PGN text extraction as native Spark expressions.

Reference semantics (fetch_and_post.py:90-111, `parse_pgn_result`):
  1. prefer the ``[Result "..."]`` tag header,
  2. else the LAST standalone result token (``1-0`` / ``0-1`` /
     ``1/2-1/2``) in the movetext,
  3. else fall back to ``"{white_result} / {black_result}"``
     (fetch_and_post.py:135-144), else empty string.

ECO extraction (SURVEY.md §1.3 T11): PGN tag header ``[ECO "B20"]``.

All of this is regex-expressible, so it runs JVM-side under
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RESULT_HEADER_RE = r'\[Result "([^"]+)"\]'
# \b on both ends matches the reference exactly (fetch_and_post.py:107:
# r'\b(1-0|0-1|1/2-1/2)\b') so a result string embedded in a longer
# token run ("x11-0", "1-00") is NOT a result.
RESULT_TOKEN_RE = r"\b(1-0|0-1|1/2-1/2)\b"
ECO_HEADER_RE = r'\[ECO "([^"]+)"\]'


def _nonempty(col: Column) -> Column:
    """NULL instead of empty string, so coalesce() can chain fallbacks."""
    return F.nullif(col, F.lit(""))


def pgn_result(pgn: Column) -> Column:
    """Result from PGN: header tag, else last standalone token, else NULL."""
    header = _nonempty(F.regexp_extract(pgn, RESULT_HEADER_RE, 1))
    # Last occurrence wins (fetch_and_post.py:107-109 iterates to the last
    # match). try_element_at(-1) is NULL-safe on empty arrays (ANSI mode).
    last_token = F.try_element_at(F.regexp_extract_all(pgn, F.lit(RESULT_TOKEN_RE), F.lit(1)), F.lit(-1))
    return F.coalesce(header, last_token)


def game_result(pgn: Column, white_result: Column, black_result: Column) -> Column:
    """Full result fallback chain, ending in '' (fetch_and_post.py:131-144).

    The seat fallback fires when EITHER side's result is non-empty (the
    reference emits ``f"{white} / {black}"`` whenever either string is
    truthy, :135-144); when both are NULL/empty the result is ``''``,
    never a bare ``" / "``.
    """
    w = _nonempty(F.coalesce(white_result, F.lit("")))
    b = _nonempty(F.coalesce(black_result, F.lit("")))
    seat_fallback = F.when(
        w.isNotNull() | b.isNotNull(),
        F.concat_ws(
            " / ", F.coalesce(white_result, F.lit("")), F.coalesce(black_result, F.lit(""))
        ),
    )
    return F.coalesce(pgn_result(pgn), seat_fallback, F.lit(""))


def pgn_eco(pgn: Column) -> Column:
    """Opening ECO code from the PGN tag header; NULL when absent."""
    return _nonempty(F.regexp_extract(pgn, ECO_HEADER_RE, 1))
