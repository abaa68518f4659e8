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

# \s+ after the tag name matches the reference exactly
# (fetch_and_post.py:102: r'\[Result\s+"([^"]+)"\]') — any run of
# whitespace between ``Result`` and the opening quote is accepted, and
# the captured value is stripped (fetch_and_post.py:104 ``.strip()``).
RESULT_HEADER_RE = r'\[Result\s+"([^"]+)"\]'
# \b on both ends matches the reference exactly (fetch_and_post.py:107:
# r'\b(1-0|0-1|1/2-1/2)\b') so a result string embedded in a longer
# token run ("x11-0", "1-00") is NOT a result.
RESULT_TOKEN_RE = r"\b(1-0|0-1|1/2-1/2)\b"
ECO_HEADER_RE = r'\[ECO "([^"]+)"\]'
# Python str.strip() twin for the captured header group. Java regex \s
# is [ \t\n\x0B\f\r] — the ASCII whitespace str.strip() removes (the
# exotic unicode-space tail of str.strip() is out of PGN's alphabet).
_STRIP_RE = r"^\s+|\s+$"


def _nonempty(col: Column) -> Column:
    """NULL instead of empty string, so coalesce() can chain fallbacks."""
    return F.nullif(col, F.lit(""))


def pgn_result(pgn: Column) -> Column:
    """Result from PGN: header tag (stripped), else last token, else NULL.

    Faithful to ``parse_pgn_result`` (fetch_and_post.py:100-111): when the
    header REGEX MATCHES, its stripped value is the answer even if the
    strip leaves an empty string — the reference ``return``s inside the
    ``if m:`` branch, so a whitespace-only header value yields ``""``
    (NULL here) WITHOUT falling through to the movetext token search.
    """
    # The capture group is [^"]+ (>=1 char), so raw != '' iff the header
    # regex matched at all — the match/no-match split regexp_extract's
    # empty-string-on-miss convention would otherwise erase.
    raw = F.regexp_extract(pgn, RESULT_HEADER_RE, 1)
    header = _nonempty(F.regexp_replace(raw, _STRIP_RE, ""))
    # Last occurrence wins (fetch_and_post.py:107-109 iterates to the last
    # match). try_element_at(-1) is NULL-safe on empty arrays (ANSI mode).
    last_token = F.try_element_at(F.regexp_extract_all(pgn, F.lit(RESULT_TOKEN_RE), F.lit(1)), F.lit(-1))
    return F.when(raw != F.lit(""), header).otherwise(last_token)


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
