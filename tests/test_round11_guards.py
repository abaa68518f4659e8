"""Round-11 guards: the capability-gated entropy-coded decode
(verdict-r10 ask #8) and the stream_dq_report exactly-once read.

The codec tests GATE on pillow availability: without it the decode
tests SKIP (not stub) and the gate test asserts the loud plan-build
failure; when pillow appears in the container they light up end-to-end
(PIL-generated PNG/JPEG blobs -> mapInArrow decode -> stats checked
against the same numpy ground truth the pure-Python raster path uses).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators.multimodal import (
    CODEC_STATS_SCHEMA,
    MissingCodecError,
    codec_available,
    codec_pixel_stats,
)

needs_codec = pytest.mark.skipif(
    not codec_available(), reason="pillow not importable in this environment"
)


def _frames(spark, blobs):
    return spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "doc_id long, content binary"
    )


class TestCodecGate:
    def test_missing_codec_raises_at_plan_build(self, spark):
        if codec_available():
            pytest.skip("codec present — the decode tests cover this env")
        df = _frames(spark, [b"\x89PNG\r\n\x1a\n"])
        with pytest.raises(MissingCodecError, match="pillow"):
            codec_pixel_stats(df)

    def test_schema_contract_is_stable(self):
        # The Arrow batch schema inside the worker mirrors this exactly;
        # downstream queries bind to these names/types either way.
        names = [f.name for f in CODEC_STATS_SCHEMA.fields]
        assert names == [
            "doc_id", "format", "width", "height",
            "mean_r", "mean_g", "mean_b", "min_px", "max_px",
            "lum_b0", "lum_b1", "lum_b2", "lum_b3",
        ]


@needs_codec
class TestCodecDecode:
    def _png(self, w, h, seed):
        import io

        import numpy as np
        from PIL import Image

        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(buf, format="PNG")
        return buf.getvalue(), arr

    def _expected(self, arr):
        import math

        import numpy as np

        a = arr.astype(np.int64)
        r, g, b = a[..., 0].ravel(), a[..., 1].ravel(), a[..., 2].ravel()
        n = r.size
        means = [
            math.floor(float(c.sum()) / n * 1000000.0 + 0.5) / 1000000.0
            for c in (r, g, b)
        ]
        mn = int(min(r.min(), g.min(), b.min()))
        mx = int(max(r.max(), g.max(), b.max()))
        lum = (299 * r + 587 * g + 114 * b) // 1000
        bins = np.minimum(lum // 64, 3)
        hist = [int((bins == i).sum()) for i in range(4)]
        return (*means, mn, mx, *hist)

    def test_png_roundtrip_matches_numpy_ground_truth(self, spark):
        blobs, arrs = zip(*[self._png(12 + i, 9 + i, seed=i) for i in range(4)])
        got = {
            r["doc_id"]: r
            for r in codec_pixel_stats(_frames(spark, list(blobs))).collect()
        }
        assert len(got) == 4
        for i, arr in enumerate(arrs):
            row = got[i]
            assert row["format"] == "png"
            assert (row["width"], row["height"]) == (arr.shape[1], arr.shape[0])
            exp = self._expected(arr)
            assert (
                row["mean_r"], row["mean_g"], row["mean_b"],
                row["min_px"], row["max_px"],
                row["lum_b0"], row["lum_b1"], row["lum_b2"], row["lum_b3"],
            ) == exp

    def test_jpeg_decodes_with_format_tag(self, spark):
        # JPEG is lossy — assert structure (format/size/stat bounds),
        # not exact pixel values.
        import io

        import numpy as np
        from PIL import Image

        arr = np.full((16, 20, 3), 128, dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(buf, format="JPEG", quality=95)
        row = codec_pixel_stats(_frames(spark, [buf.getvalue()])).collect()[0]
        assert row["format"] == "jpeg"
        assert (row["width"], row["height"]) == (20, 16)
        assert 120.0 <= row["mean_r"] <= 136.0
        assert row["lum_b0"] + row["lum_b1"] + row["lum_b2"] + row["lum_b3"] == 16 * 20

    def test_malformed_blob_yields_null_stats(self, spark):
        rows = codec_pixel_stats(
            _frames(spark, [b"not an image at all", None])
        ).collect()
        assert len(rows) == 2
        for r in rows:
            assert r["mean_r"] is None and r["width"] is None


# ---------------------------------------------------------------------------
# Delta-log golden-file contract (verdict-r10 ask #7, env-blocked
# DuckDB delta_scan fallback: the sandbox has no network, so the
# extension cannot load — pin the serialized protocol bytes instead)
# ---------------------------------------------------------------------------
import json
import os
import re

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "delta_log_r11.golden")

_UUID_RE = re.compile(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")
_TS_KEYS = ("modificationTime", "deletionTimestamp", "createdTime")


def _canon_action(a: dict) -> dict:
    """Normalize the DOCUMENTED nondeterminism (task-UUID file names,
    byte sizes, mtimes, uuid5-of-tmp-path table id) and nothing else —
    every remaining byte is the protocol contract."""
    a = json.loads(json.dumps(a))  # deep copy
    for k in ("add", "remove", "metaData"):
        if k in a:
            body = a[k]
            if "path" in body:
                body["path"] = _UUID_RE.sub("<UUID>", body["path"])
            if "size" in body:
                body["size"] = "<SIZE>"
            if "id" in body:
                body["id"] = "<ID>"
            for tk in _TS_KEYS:
                if tk in body:
                    body[tk] = "<TS>"
    return a


_TXN_RE = re.compile(r"txn-[0-9a-f]{32}")


def _canon_log(ldir: str) -> str:
    chunks = []
    for v in sorted(os.listdir(ldir)):
        chunks.append(f"== {v} ==")
        with open(os.path.join(ldir, v)) as f:
            for line in f:
                chunks.append(json.dumps(_canon_action(json.loads(line)), sort_keys=True))
    text = "\n".join(chunks) + "\n"
    # txn ids are per-run random, but their IDENTITY is structure (the
    # remove must reference the same txn dir as version 0's add) — map
    # each distinct id to its order of first appearance.
    seen: dict[str, str] = {}
    def sub(m):
        t = m.group(0)
        if t not in seen:
            seen[t] = f"txn-<T{len(seen) + 1}>"
        return seen[t]
    return _TXN_RE.sub(sub, text)


class TestDeltaLogGolden:
    def _sink(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.plans.ingest import (
            commit_append_manifest,
            commit_merge_manifest,
        )
        from chesscom_etl_tableau_spark.sources.tables import load_table

        path = str(tmp_path / "gsink")
        ev = (
            load_table(spark, "/root/testdata/sf0.001", "events")
            .where(F.col("event_id") % 7 == 0)
            .select(F.col("event_id").alias("game_url"), "user_id")
        )
        commit_append_manifest(
            ev.where(F.col("game_url") % 2 == 0).repartition(1).localCheckpoint(), path
        )
        commit_append_manifest(
            ev.where(F.col("game_url") % 2 != 0).repartition(1).localCheckpoint(), path
        )
        upsert = (
            ev.where(F.col("game_url") % 14 == 0)
            .withColumn("user_id", F.lit(-1).cast("long"))
            .repartition(1)
        )
        commit_merge_manifest(upsert.localCheckpoint(), path)
        return path

    def test_export_matches_golden(self, spark, tmp_path):
        from chesscom_etl_tableau_spark.plans.metadata_export import export_delta_log

        sink = self._sink(spark, tmp_path)
        ldir = export_delta_log(spark, sink)
        got = _canon_log(ldir)
        if not os.path.exists(GOLDEN):  # first run: write, then fail loudly
            with open(GOLDEN, "w") as f:
                f.write(got)
            pytest.fail(
                f"golden file created at {GOLDEN}; review and commit it, "
                "then re-run"
            )
        with open(GOLDEN) as f:
            assert got == f.read(), (
                "exported _delta_log diverged from the committed protocol "
                "golden (action vocabulary / field layout / ordering)"
            )
