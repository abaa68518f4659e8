"""Explicit schemas for every table in the engine.

The reference enforces a fixed header row at write time and resets it
if it drifts (fetch_and_post.py:197-227); the Spark equivalent is an
explicit ``StructType`` declared once and asserted on both read and
write (`enforce_schema`). No ``inferSchema`` in production paths.

Fact-table column semantics: SURVEY.md §1.2 (fetch_and_post.py:47-51,
146-160). Nested source record: SURVEY.md §1.1 / FIXTURES.md §2
(fetch_and_post.py:114-161,344).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Fact table: one row per game (reference: the `Games` sheet, 13 columns).
# ---------------------------------------------------------------------------
GAMES_SCHEMA = StructType(
    [
        StructField("ingest_time", TimestampType(), nullable=True),
        StructField("username", StringType(), nullable=False),
        StructField("archive_url", StringType(), nullable=True),
        StructField("game_url", StringType(), nullable=False),  # primary dedup key
        StructField("time_control", StringType(), nullable=True),
        StructField("end_time_utc", TimestampType(), nullable=True),
        StructField("date_ymd", DateType(), nullable=True),
        StructField("white_username", StringType(), nullable=True),
        StructField("white_rating", IntegerType(), nullable=True),
        StructField("black_username", StringType(), nullable=True),
        StructField("black_rating", IntegerType(), nullable=True),
        StructField("result", StringType(), nullable=True),
        StructField("pgn", StringType(), nullable=True),
    ]
)

# ---------------------------------------------------------------------------
# Nested source record: one row per (username, archive_url) with the raw
# games array (reference: Chess.com monthly archive JSON).
# ---------------------------------------------------------------------------
PLAYER_SEAT_SCHEMA = StructType(
    [
        StructField("username", StringType(), True),
        StructField("rating", LongType(), True),
        StructField("result", StringType(), True),
    ]
)

GAME_STRUCT_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("time_control", StringType(), True),
        StructField("end_time", LongType(), True),  # epoch seconds
        StructField("pgn", StringType(), True),
        StructField("white", PLAYER_SEAT_SCHEMA, True),
        StructField("black", PLAYER_SEAT_SCHEMA, True),
    ]
)

ARCHIVE_SCHEMA = StructType(
    [
        StructField("username", StringType(), False),
        StructField("archive_url", StringType(), False),
        StructField("games", ArrayType(GAME_STRUCT_SCHEMA), True),
    ]
)

# ---------------------------------------------------------------------------
# Audit + log sinks (reference: ProceeedArchives / StatusLog sheets).
# ---------------------------------------------------------------------------
PROCESSED_ARCHIVES_SCHEMA = StructType(
    [
        StructField("username", StringType(), False),
        StructField("archive_url", StringType(), False),
        StructField("processed_at_utc", TimestampType(), True),
        StructField("game_count", IntegerType(), True),
    ]
)

STATUS_LOG_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("username", StringType(), True),
        StructField("stage", StringType(), False),
        StructField("message", StringType(), True),
        StructField("http_status", StringType(), True),
        StructField("timestamp_utc", TimestampType(), True),
    ]
)

# Checkpoint state: per-user watermark + processed partition set
# (reference: state.json {username: {last_end_time, processed_archives}}).
STATE_SCHEMA = StructType(
    [
        StructField("username", StringType(), False),
        StructField("last_end_time", LongType(), True),
        StructField("processed_archives", ArrayType(StringType()), True),
    ]
)


class SchemaMismatchError(ValueError):
    """Raised when a DataFrame does not conform to a declared schema."""


def enforce_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """Assert `df` has exactly the declared columns/types; reorder columns.

    Mirrors the reference's header self-healing (fetch_and_post.py:197-227):
    column order drift is repaired, type/name drift is an error.
    """
    expected = {f.name: f.dataType for f in schema.fields}
    actual = {f.name: f.dataType for f in df.schema.fields}
    missing = set(expected) - set(actual)
    extra = set(actual) - set(expected)
    if missing or extra:
        raise SchemaMismatchError(f"missing={sorted(missing)} extra={sorted(extra)}")
    for name, dtype in expected.items():
        if actual[name] != dtype:
            raise SchemaMismatchError(f"column {name}: expected {dtype}, got {actual[name]}")
    return df.select(*[f.name for f in schema.fields])
