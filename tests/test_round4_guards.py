"""Round-4 guards: sketch accuracy bound, ingest commit protocol,
streaming sessionize state bounds, multimodal header decoders.

Each test pins a verdict-r3 ask (VERDICT.md §Next round)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


SF_DIR = "/root/testdata/sf0.001"


class TestApproxDistinctBound:
    """a14: the raw HLL++ estimate (not just the boolean contract column)
    stays within 5 standard errors of exact, per event_type."""

    def test_hll_within_5_sigma(self, spark):
        rsd = 0.02
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        rows = (
            ev.groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id", rsd=rsd).alias("approx"),
                F.count_distinct("user_id").alias("exact"),
            )
            .collect()
        )
        assert rows, "events table empty"
        for r in rows:
            bound = 5 * rsd * r["exact"]
            assert abs(r["approx"] - r["exact"]) <= bound, (
                f"{r['event_type']}: |{r['approx']} - {r['exact']}| > {bound}"
            )

    def test_registry_query_contract_column(self, spark):
        import __spark_entry__ as entry

        df = entry.queries()["a14_approx_distinct"](spark, SF_DIR)
        assert df.columns == [
            "event_type",
            "exact_users",
            "n_events",
            "approx_within_bound",
        ]
        assert all(r["approx_within_bound"] for r in df.collect())


class TestMediaHeaderParsers:
    """mm: parse_media does real structural decoding of the four
    self-describing containers _blob_for generates — no codec library.
    (VERDICT.md r3 ask #6.)"""

    def test_roundtrip_all_formats(self):
        from chesscom_etl_tableau_spark.operators.multimodal import (
            _blob_for,
            parse_media,
        )

        for doc_id in range(0, 32):  # 8 of each format
            fmt, w, h, dur = parse_media(_blob_for(doc_id))
            exp_fmt = ("bmp", "ppm", "gif", "wav")[doc_id % 4]
            assert fmt == exp_fmt, doc_id
            if exp_fmt == "wav":
                assert (w, h) == (None, None)
                assert dur == 100 + doc_id % 200
            else:
                assert w == 8 + doc_id % 24
                assert h == 8 + (doc_id * 3) % 24
                assert dur is None

    def test_unrecognized_and_truncated_blobs(self):
        from chesscom_etl_tableau_spark.operators.multimodal import (
            _blob_for,
            parse_media,
        )

        assert parse_media(b"") == (None, None, None, None)
        assert parse_media("plain utf-8 text".encode()) == (None, None, None, None)
        # truncated headers must not crash or invent metadata
        assert parse_media(b"BM\x00\x01") == (None, None, None, None)
        assert parse_media(b"RIFF\x04\x00\x00\x00WAVE") == (None, None, None, None)
        # a real wav truncated mid-data still parses its fmt/data header
        # (duration comes from the declared chunk size, not the payload)
        wav = _blob_for(3)[:60]
        fmt, _, _, dur = parse_media(wav)
        assert fmt == "wav" and dur == 103

    def test_negative_height_bmp_is_topdown(self):
        from chesscom_etl_tableau_spark.operators.multimodal import parse_media

        blob = (
            b"BM" + (54).to_bytes(4, "little") + b"\x00" * 4
            + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + (16).to_bytes(4, "little", signed=True)
            + (-9).to_bytes(4, "little", signed=True)
        )
        assert parse_media(blob) == ("bmp", 16, 9, None)
