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


class TestCommitProtocol:
    """Write-audit-publish closes the concurrent-writer lost-update
    window WITHOUT the heal step (VERDICT.md r3 ask #4). The round-2
    guard test_race_duplicates_then_heal documents the raw-append
    hazard; these tests pin that commit_append prevents it."""

    def test_race_zero_duplicates_without_heal(self, spark, archives_df, tmp_path):
        from chesscom_etl_tableau_spark.plans.ingest import (
            commit_append,
            dedup_against_sink,
        )
        from chesscom_etl_tableau_spark.sources.archives import flatten_archives

        sink = str(tmp_path / "sink")
        flat = flatten_archives(archives_df)
        flat.limit(0).write.parquet(sink)

        batch_a = flat.where(F.col("username") == "player0")
        overlap = batch_a.limit(20)
        batch_b = flat.where(F.col("username") == "player1").unionByName(overlap)

        # Both writers resolve their anti-join against the SAME (empty)
        # snapshot — the exact lost-update interleaving of the r2 test.
        new_a = dedup_against_sink(batch_a, sink).localCheckpoint()
        new_b = dedup_against_sink(batch_b, sink).localCheckpoint()
        n_a = commit_append(new_a, sink)
        n_b = commit_append(new_b, sink)

        sunk = spark.read.parquet(sink)
        total = sunk.count()
        distinct = sunk.select("game_url").distinct().count()
        assert total == distinct, "commit protocol must not admit duplicates"
        assert n_a + n_b == total
        # the second committer's audit dropped exactly the overlap
        assert n_b == new_b.count() - overlap.select("game_url").distinct().count()

    def test_threaded_writers_serialize(self, spark, tmp_path):
        import threading

        from chesscom_etl_tableau_spark.plans.ingest import commit_append

        sink = str(tmp_path / "tsink")
        # 4 writers, heavily overlapping key ranges
        batches = [
            spark.range(i * 50, i * 50 + 200).select(
                F.concat(F.lit("k"), F.col("id")).alias("game_url"),
                F.col("id").alias("payload"),
            ).localCheckpoint()
            for i in range(4)
        ]
        published = [0] * 4
        errs = []

        def commit(i):
            try:
                published[i] = commit_append(batches[i], sink)
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        threads = [threading.Thread(target=commit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        sunk = spark.read.parquet(sink)
        assert sunk.count() == sunk.select("game_url").distinct().count() == 350
        assert sum(published) == 350

    def test_stale_lock_is_broken(self, spark, tmp_path):
        import os

        from chesscom_etl_tableau_spark.plans.ingest import commit_append

        sink = str(tmp_path / "ssink")
        lock = sink + ".commitlock"
        os.mkdir(lock)
        os.utime(lock, (1, 1))  # ancient mtime = crashed holder
        df = spark.range(5).select(F.concat(F.lit("k"), F.col("id")).alias("game_url"))
        assert commit_append(df, sink, stale_lock_s=60) == 5
        assert not os.path.exists(lock)

    def test_held_lock_times_out(self, spark, tmp_path):
        import os

        from chesscom_etl_tableau_spark.plans.ingest import commit_append

        sink = str(tmp_path / "lsink")
        os.mkdir(sink + ".commitlock")  # fresh mtime = live holder
        df = spark.range(3).select(F.concat(F.lit("k"), F.col("id")).alias("game_url"))
        with pytest.raises(TimeoutError):
            commit_append(df, sink, lock_timeout_s=1.0)
        os.rmdir(sink + ".commitlock")

    def test_ingest_still_idempotent_end_to_end(self, spark, archives_df, tmp_path):
        from chesscom_etl_tableau_spark.plans.ingest import ingest_archives

        sink = str(tmp_path / "isink")
        state = str(tmp_path / "istate.json")
        r1 = ingest_archives(spark, archives_df, sink, state_path=state)
        r2 = ingest_archives(spark, archives_df, sink, state_path=state)
        sunk = spark.read.parquet(sink)
        assert sunk.count() == sunk.select("game_url").distinct().count() == r1.appended_games
        assert r2.appended_games == 0
