"""Streaming SCD2 maintenance (streaming/scd_stream.py).

The contract under test: draining a watermark-ordered change stream
through the foreachBatch maintainer leaves the manifest sink holding
EXACTLY the dimension `scd2_build` produces over the concatenated
feed — across multiple drains (restart from checkpoint), replayed
microbatches (foreachBatch at-least-once), and mixed new/known keys.
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.scd import scd2_build
from chesscom_etl_tableau_spark.streaming.scd_stream import (
    read_scd2_dim,
    scd2_merge_batch,
    streaming_scd2,
)

SCHEMA = "user_id string, rating_band string, ts timestamp"
DIM_COLS = ["user_id", "rating_band", "effective_from", "effective_to",
            "is_current", "version"]


def _write_changes(path, rows):
    path.write_text(
        "\n".join(
            json.dumps({"user_id": u, "rating_band": b, "ts": ts})
            for u, b, ts in rows
        )
        + "\n"
    )


def _drain(spark, drop, sink, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(drop))
    q = streaming_scd2(
        stream, str(sink), str(ckpt),
        key_col="user_id", attr_col="rating_band", ts_col="ts",
    )
    q.awaitTermination()


def _mk_changes(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, rating_band string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _batch_dim(spark, all_rows):
    return scd2_build(
        _mk_changes(spark, all_rows), "user_id", "rating_band", "ts"
    )


def _sorted(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.select(*DIM_COLS).collect()
    )


class TestStreamingScd2:
    pytestmark = pytest.mark.slow  # heavy suite, default-profile excluded (r16)
    B1 = [
        ("u1", "1200-1400", "2024-01-01T10:00:00"),
        ("u1", "1400-1600", "2024-01-02T10:00:00"),
        ("u2", "800-1000", "2024-01-01T12:00:00"),
    ]
    B2 = [
        ("u1", "1400-1600", "2024-01-03T10:00:00"),  # no-op observation
        ("u2", "1000-1200", "2024-01-04T09:00:00"),  # change
        ("u3", "1600-1800", "2024-01-04T11:00:00"),  # new key
    ]
    B3 = [
        ("u3", "1800-2000", "2024-01-05T08:00:00"),
        ("u1", "1200-1400", "2024-01-06T10:00:00"),  # back to an old band
    ]

    def test_drain_equals_batch_build(self, spark, tmp_path):
        drop = tmp_path / "drop"
        drop.mkdir()
        sink, ckpt = tmp_path / "dim", tmp_path / "ckpt"
        _write_changes(drop / "b1.json", self.B1)
        _write_changes(drop / "b2.json", self.B2)
        _drain(spark, drop, sink, ckpt)

        got = read_scd2_dim(spark, str(sink))
        want = _batch_dim(spark, self.B1 + self.B2)
        assert _sorted(got) == _sorted(want)

    def test_restart_from_checkpoint_continues(self, spark, tmp_path):
        drop = tmp_path / "drop"
        drop.mkdir()
        sink, ckpt = tmp_path / "dim", tmp_path / "ckpt"
        _write_changes(drop / "b1.json", self.B1)
        _drain(spark, drop, sink, ckpt)
        # second drain, same checkpoint: only the new files are read
        _write_changes(drop / "b2.json", self.B2)
        _write_changes(drop / "b3.json", self.B3)
        _drain(spark, drop, sink, ckpt)

        got = read_scd2_dim(spark, str(sink))
        want = _batch_dim(spark, self.B1 + self.B2 + self.B3)
        assert _sorted(got) == _sorted(want)
        # u1 went 1200-1400 -> 1400-1600 -> 1200-1400: three versions,
        # exactly one current
        u1 = got.where(F.col("user_id") == "u1")
        assert u1.count() == 3
        assert u1.where("is_current").count() == 1
        assert (
            u1.where("is_current").select("version").first()[0] == 3
        )

    def _mk_batch(self, spark, rows):
        return _mk_changes(spark, rows)

    def test_replayed_batch_is_noop(self, spark, tmp_path):
        sink = tmp_path / "dim"
        b1 = self._mk_batch(spark, self.B1)
        b2 = self._mk_batch(spark, self.B2)
        n1 = scd2_merge_batch(b1, str(sink), "user_id", "rating_band", "ts")
        n2 = scd2_merge_batch(b2, str(sink), "user_id", "rating_band", "ts")
        assert n1 > 0 and n2 > 0
        before = _sorted(read_scd2_dim(spark, str(sink)))
        # foreachBatch recovery replays the last batch. B2's u2/u3
        # events land at-or-before their open effective_from (fenced
        # out); u1's event was a no-op OBSERVATION (ts advanced, attr
        # unchanged), indistinguishable from a fresh no-op — it
        # re-merges u1's open row byte-identically. The contract is
        # STATE idempotence, not zero merges.
        n_replay = scd2_merge_batch(
            b2, str(sink), "user_id", "rating_band", "ts"
        )
        assert n_replay == 1
        assert _sorted(read_scd2_dim(spark, str(sink))) == before
        # a replayed batch that ENDED in a change per key is a strict
        # no-op: every event is <= its key's open effective_from
        b3 = self._mk_batch(spark, self.B3)
        scd2_merge_batch(b3, str(sink), "user_id", "rating_band", "ts")
        after3 = _sorted(read_scd2_dim(spark, str(sink)))
        assert (
            scd2_merge_batch(b3, str(sink), "user_id", "rating_band", "ts")
            == 0
        )
        assert _sorted(read_scd2_dim(spark, str(sink))) == after3

    def test_replayed_first_batch_is_noop(self, spark, tmp_path):
        sink = tmp_path / "dim"
        b1 = self._mk_batch(spark, self.B1)
        scd2_merge_batch(b1, str(sink), "user_id", "rating_band", "ts")
        before = _sorted(read_scd2_dim(spark, str(sink)))
        assert (
            scd2_merge_batch(b1, str(sink), "user_id", "rating_band", "ts")
            == 0
        )
        assert _sorted(read_scd2_dim(spark, str(sink))) == before

    def test_stale_events_filtered_not_applied(self, spark, tmp_path):
        sink = tmp_path / "dim"
        b1 = self._mk_batch(spark, self.B1)
        scd2_merge_batch(b1, str(sink), "user_id", "rating_band", "ts")
        before = _sorted(read_scd2_dim(spark, str(sink)))
        # an out-of-order correction BEFORE u1's open effective_from
        late = self._mk_batch(
            spark, [("u1", "0-800", "2024-01-01T23:00:00")]
        )
        assert (
            scd2_merge_batch(late, str(sink), "user_id", "rating_band", "ts")
            == 0
        )
        assert _sorted(read_scd2_dim(spark, str(sink))) == before

    def test_merge_rows_are_touched_tail_only(self, spark, tmp_path):
        # the microbatch commit is O(touched keys), not O(dimension):
        # B3 touches u1 (open v2 -> closed, new v3) and u3 (open v1 ->
        # closed, new v2) = 4 tail rows, u2 untouched.
        sink = tmp_path / "dim"
        for rows in (self.B1, self.B2):
            scd2_merge_batch(
                self._mk_batch(spark, rows), str(sink),
                "user_id", "rating_band", "ts",
            )
        n3 = scd2_merge_batch(
            self._mk_batch(spark, self.B3), str(sink),
            "user_id", "rating_band", "ts",
        )
        assert n3 == 4
