"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

Design for 100 TB of media:
- The fact table stores `content: binary` next to a `media: struct`
  metadata column; Parquet stores the binary column contiguously and
  column pruning means metadata-only queries never touch the bytes.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  `mapInPandas` stages: Python touches each binary exactly once per
  stage, and batch size is bounded by `spark.sql.execution.arrow.
  maxRecordsPerBatch` so executor memory stays flat.
- The actual codec calls (PIL/ffmpeg/soundfile) are STUBBED here — the
  container has no media libraries — behind `_decode_image`, with a
  deterministic fallback so the Spark-side plumbing (schema,
  partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

import binascii
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("format", StringType(), True),      # png|jpeg|wav|mp4|...
        StructField("n_bytes", LongType(), True),
        StructField("checksum_crc32", LongType(), True),
        StructField("width", IntegerType(), True),       # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),    # audio/video
    ]
)

DECODE_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("checksum_crc32", LongType(), True),
        StructField("fake_width", IntegerType(), True),
        StructField("fake_height", IntegerType(), True),
        StructField("feature", StringType(), True),
    ]
)


def _decode_image(data: bytes) -> tuple[int, int]:
    """STUB: real impl would be PIL.Image.open(io.BytesIO(data)).size.

    The container has no image libraries; a deterministic fake derived
    from the checksum keeps the pipeline testable end-to-end.
    """
    try:
        raise NotImplementedError("image codecs not available in this environment")
    except NotImplementedError:
        crc = binascii.crc32(data)
        return 64 + crc % 1024, 64 + (crc >> 10) % 1024


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: materialize a binary column (utf-8 of text) +
    media metadata struct, the shape a real media table would have."""
    content = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    return docs.withColumn("content", content).withColumn(
        "media",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.length(F.col("content")).cast("long").alias("n_bytes"),
            F.crc32(F.col("content")).alias("checksum_crc32"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def decode_features(media_df: DataFrame, id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column."""
    import pandas as pd

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, crcs, ws, hs, feats = [], [], [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[content_col]):
                data = bytes(blob) if blob is not None else b""
                crc = binascii.crc32(data)
                w, h = _decode_image(data)
                ids.append(doc_id)
                nbytes.append(len(data))
                crcs.append(crc)
                ws.append(w)
                hs.append(h)
                # "feature": a tiny stable descriptor (first 8 bytes hex).
                feats.append(binascii.hexlify(data[:8]).decode() if data else "")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": nbytes,
                    "checksum_crc32": crcs,
                    "fake_width": ws,
                    "fake_height": hs,
                    "feature": feats,
                }
            )

    from chesscom_etl_tableau_spark.util import ensure_parallelism

    # One Python worker per partition: spread narrow sources before the
    # Arrow exchange so decode parallelism matches the cluster.
    return ensure_parallelism(media_df.select(id_col, content_col)).mapInPandas(
        decode_batches, schema=DECODE_OUT_SCHEMA
    )


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp, bytes decoding stubbed. Demonstrates the explode-style
    fan-out a real frame extractor would produce."""
    n_frames = F.greatest((F.col("media")["n_bytes"] / F.lit(every_ms)).cast("int"), F.lit(1))
    return media_df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
