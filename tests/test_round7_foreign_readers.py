"""Foreign-reader proofs for the metadata exports (verdict-r6 asks #5
and #8): DuckDB — with NO engine code in the read path — parses the
Iceberg-style `_metadata/v<gen>.metadata.json` and the minimal
Delta-protocol `_delta_log/<version>.json`, enumerates the data files,
and reproduces the same row counts the engine's own
`read_manifest_sink` reports. That is what "engine-neutral export"
claims; these tests make the claim checkable."""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.plans.ingest import (
    commit_append_manifest,
    commit_delete_vector,
    commit_merge_manifest,
    read_manifest_sink,
)
from chesscom_etl_tableau_spark.plans.metadata_export import (
    export_delta_log,
    export_metadata_json,
    snapshot_summaries,
)
from chesscom_etl_tableau_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def sink(spark, tmp_path):
    """Three commits: two appends + one COW merge (the merge rewrites a
    matched file, so the Delta export must emit `remove` actions)."""
    path = str(tmp_path / "msink")
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_id") % 7 == 0)
        .select(F.col("event_id").alias("game_url"), "user_id")
    )
    commit_append_manifest(
        ev.where(F.col("game_url") % 2 == 0).repartition(2).localCheckpoint(), path
    )
    commit_append_manifest(
        ev.where(F.col("game_url") % 2 != 0).repartition(2).localCheckpoint(), path
    )
    upsert = ev.limit(10).withColumn("user_id", F.lit(-1).cast("long"))
    commit_merge_manifest(upsert.localCheckpoint(), path)
    return path


class TestIcebergStyleForeignReader:
    def test_duckdb_reproduces_snapshot_counts(self, spark, sink):
        summaries = snapshot_summaries(spark, sink)
        meta_path = export_metadata_json(spark, sink, summaries=summaries)

        # foreign read: plain JSON for the metadata doc, DuckDB for the
        # manifests and the parquet data — zero engine calls below.
        with open(meta_path) as f:
            doc = json.load(f)
        assert doc["format"] == "spark-graft-manifest/1"
        assert doc["current_snapshot_id"] == doc["snapshots"][-1]["snapshot_id"]

        for snap in doc["snapshots"]:
            files = [
                r[0]
                for r in duckdb.sql(
                    f"select unnest(files) from read_json_auto('{snap['manifest']}')"
                ).fetchall()
            ]
            assert len(files) == snap["n_data_files"]
            flist = ", ".join(f"'{f}'" for f in files)
            n = duckdb.sql(f"select count(*) from read_parquet([{flist}])").fetchone()[0]
            # the export's footer-derived total_records is the truth a
            # foreign reader recomputes from the same files
            assert n == snap["total_records"]

        # and the CURRENT snapshot count matches the engine's own read
        engine_n = read_manifest_sink(spark, sink).count()
        cur = doc["snapshots"][-1]
        assert cur["total_records"] == engine_n


class TestDeltaLogForeignReader:
    def _replay(self, ldir: str) -> tuple[set, list]:
        """A foreign reader's Delta replay: apply add/remove actions in
        version order; returns (live relative paths, protocol actions)."""
        live: set[str] = set()
        protocols = []
        versions = sorted(os.listdir(ldir))
        for v in versions:
            with open(os.path.join(ldir, v)) as f:
                for line in f:
                    a = json.loads(line)
                    if "add" in a:
                        live.add(a["add"]["path"])
                    elif "remove" in a:
                        live.discard(a["remove"]["path"])
                    elif "protocol" in a:
                        protocols.append(a["protocol"])
        return live, protocols

    def test_duckdb_reads_the_delta_view(self, spark, sink):
        ldir = export_delta_log(spark, sink)
        assert sorted(os.listdir(ldir)) == [
            "00000000000000000000.json",
            "00000000000000000001.json",
            "00000000000000000002.json",
        ]
        live, protocols = self._replay(ldir)
        assert protocols == [{"minReaderVersion": 1, "minWriterVersion": 2}]
        assert live  # non-empty table

        # version 0 must carry metaData with a parseable Spark schema
        with open(os.path.join(ldir, "00000000000000000000.json")) as f:
            v0 = [json.loads(l) for l in f]
        meta = next(a["metaData"] for a in v0 if "metaData" in a)
        schema = json.loads(meta["schemaString"])
        assert {f["name"] for f in schema["fields"]} == {"game_url", "user_id"}

        flist = ", ".join(f"'{os.path.join(sink, p)}'" for p in sorted(live))
        n = duckdb.sql(f"select count(*) from read_parquet([{flist}])").fetchone()[0]
        assert n == read_manifest_sink(spark, sink).count()

    def test_merge_rewrite_emits_removes(self, spark, sink):
        ldir = export_delta_log(spark, sink)
        with open(os.path.join(ldir, "00000000000000000002.json")) as f:
            v2 = [json.loads(l) for l in f]
        kinds = {k for a in v2 for k in a}
        # the COW merge rewrote at least one file: adds AND removes
        assert "add" in kinds and "remove" in kinds

    def test_idempotent_reexport(self, spark, sink):
        ldir = export_delta_log(spark, sink)
        before = {
            v: open(os.path.join(ldir, v)).read() for v in sorted(os.listdir(ldir))
        }
        export_delta_log(spark, sink)  # lost-race path: existing files win
        after = {
            v: open(os.path.join(ldir, v)).read() for v in sorted(os.listdir(ldir))
        }
        assert before == after

    def test_refuses_delete_vectors(self, spark, sink):
        doomed = read_manifest_sink(spark, sink).limit(3).select("game_url")
        assert commit_delete_vector(doomed.localCheckpoint(), sink) > 0
        with pytest.raises(ValueError, match="delete vectors"):
            export_delta_log(spark, sink)


class TestDeltaLogAfterExpiry:
    """Round-8 regression (ADVICE r7): Delta versions derive from the
    manifest GENERATION number, so `manifest_expire` + re-export keeps
    old version files authoritative and appends only new versions —
    no index shift, no silent stale log, no stat of gc'd files."""

    def _append(self, spark, sink, mod):
        ev = (
            load_table(spark, SF_DIR, "events")
            .where(F.col("event_id") % 11 == mod)
            .select(F.col("event_id").alias("game_url"), "user_id")
        )
        commit_append_manifest(ev.repartition(1).localCheckpoint(), sink)

    def test_expire_gc_then_reexport_appends_new_versions(self, spark, sink):
        from chesscom_etl_tableau_spark.plans.ingest import (
            manifest_expire,
            manifest_gc,
        )

        ldir = export_delta_log(spark, sink)
        before = {
            v: open(os.path.join(ldir, v)).read() for v in os.listdir(ldir)
        }
        # retire gens 1-2 (their exclusive files become reapable), gc,
        # then publish a NEW generation and re-export
        assert manifest_expire(sink, keep_last=1) == 2
        manifest_gc(sink)
        self._append(spark, sink, 3)
        export_delta_log(spark, sink)

        names = sorted(os.listdir(ldir))
        assert names == [f"{v:020d}.json" for v in range(4)]
        # old version files byte-identical (never rebuilt => no
        # FileNotFoundError on gc'd historical data files)
        for v, body in before.items():
            assert open(os.path.join(ldir, v)).read() == body
        # foreign replay of the full log reproduces the engine's
        # current row count
        live: set[str] = set()
        for v in names:
            with open(os.path.join(ldir, v)) as f:
                for line in f:
                    a = json.loads(line)
                    if "add" in a:
                        live.add(a["add"]["path"])
                    elif "remove" in a:
                        live.discard(a["remove"]["path"])
        flist = ", ".join(f"'{os.path.join(sink, p)}'" for p in sorted(live))
        n = duckdb.sql(
            f"select count(*) from read_parquet([{flist}])"
        ).fetchone()[0]
        assert n == read_manifest_sink(spark, sink).count()

    def test_reexport_replays_log_when_predecessor_expired(self, spark, sink):
        from chesscom_etl_tableau_spark.plans.ingest import (
            manifest_expire,
            manifest_gc,
        )

        ldir = export_delta_log(spark, sink)
        # expire EVERYTHING but the newest, gc, then two new commits;
        # the newest surviving gen (3) expires next round, leaving the
        # first missing version's predecessor reconstructible only by
        # replaying the exported log
        manifest_expire(sink, keep_last=1)
        self._append(spark, sink, 3)
        manifest_expire(sink, keep_last=1)  # now only gen 4 survives...
        manifest_gc(sink)
        self._append(spark, sink, 5)  # ...plus new gen 5
        export_delta_log(spark, sink)
        names = sorted(os.listdir(ldir))
        assert names == [f"{v:020d}.json" for v in range(5)]
        live: set[str] = set()
        for v in names:
            with open(os.path.join(ldir, v)) as f:
                for line in f:
                    a = json.loads(line)
                    if "add" in a:
                        live.add(a["add"]["path"])
                    elif "remove" in a:
                        live.discard(a["remove"]["path"])
        flist = ", ".join(f"'{os.path.join(sink, p)}'" for p in sorted(live))
        n = duckdb.sql(
            f"select count(*) from read_parquet([{flist}])"
        ).fetchone()[0]
        assert n == read_manifest_sink(spark, sink).count()

    def test_first_export_after_expiry_refuses(self, spark, sink):
        from chesscom_etl_tableau_spark.plans.ingest import manifest_expire

        manifest_expire(sink, keep_last=1)  # gen 1-2 gone, NO log yet
        with pytest.raises(ValueError, match="anchored at version 0"):
            export_delta_log(spark, sink)

    def test_diverged_log_raises_not_silently_kept(self, spark, sink):
        ldir = export_delta_log(spark, sink)
        # simulate a log written by a broken exporter: v1 missing, v2
        # holding content that does not match the manifests
        os.remove(os.path.join(ldir, "00000000000000000001.json"))
        v2 = os.path.join(ldir, "00000000000000000002.json")
        with open(v2, "w") as f:
            f.write('{"add": {"path": "bogus.parquet"}}\n')
        with pytest.raises(RuntimeError, match="diverged"):
            export_delta_log(spark, sink)

    def test_file_uri_resolves_instead_of_empty(self, spark, sink):
        # file:// used to slip past the local-only guard and report
        # "no published snapshots" — the failure the guard exists for
        summaries = snapshot_summaries(spark, "file://" + sink)
        assert len(summaries) == 3
        with pytest.raises(ValueError, match="remote URI"):
            snapshot_summaries(spark, "s3a://bucket/sink")


class TestRound9ExportHardening:
    """Round-9 fixes (ADVICE r8 + verdict ask #7): canonical path form
    in log replay, whole-log hole check, diverged-log rejection with
    zero side effects, metadata-json divergence symmetry, and the
    single-slash file:/ URI form."""

    def _append(self, spark, sink, mod):
        ev = (
            load_table(spark, SF_DIR, "events")
            .where(F.col("event_id") % 11 == mod)
            .select(F.col("event_id").alias("game_url"), "user_id")
        )
        commit_append_manifest(ev.repartition(1).localCheckpoint(), sink)

    def test_unnormalized_sink_path_replay_no_churn(self, spark, tmp_path):
        # Manifest `files` inherit the sink path SPELLING the committer
        # passed; an unnormalized spelling (here `/x/./msink`) used to
        # make replayed (abspath-joined) and manifest (raw) sets
        # textually disjoint, emitting full add+remove churn per
        # replayed version — foreign readers replayed to an empty
        # table. Both sides now canonicalize through _rel_path.
        from chesscom_etl_tableau_spark.plans.ingest import (
            manifest_expire,
            manifest_gc,
        )

        sink = str(tmp_path) + "/./dotsink"
        self._append(spark, sink, 1)
        self._append(spark, sink, 2)
        ldir = export_delta_log(spark, sink)
        # force the replay path: the predecessor of the first missing
        # version must itself be expired
        manifest_expire(sink, keep_last=1)
        self._append(spark, sink, 3)
        manifest_expire(sink, keep_last=1)
        manifest_gc(sink)
        self._append(spark, sink, 4)
        export_delta_log(spark, sink)
        names = sorted(os.listdir(ldir))
        assert names == [f"{v:020d}.json" for v in range(4)]
        # the replayed versions must contain ONLY their generation's
        # true delta — no remove churn from path-form mismatch
        for name in names[2:]:
            with open(os.path.join(ldir, name)) as f:
                actions = [json.loads(line) for line in f]
            assert all("add" in a for a in actions)
        # full foreign replay reproduces the engine count
        live: set[str] = set()
        for v in names:
            with open(os.path.join(ldir, v)) as f:
                for line in f:
                    a = json.loads(line)
                    if "add" in a:
                        live.add(a["add"]["path"])
                    elif "remove" in a:
                        live.discard(a["remove"]["path"])
        assert live, "foreign replay saw an empty table"
        flist = ", ".join(f"'{os.path.join(sink, p)}'" for p in sorted(live))
        n = duckdb.sql(f"select count(*) from read_parquet([{flist}])").fetchone()[0]
        assert n == read_manifest_sink(spark, sink).count()

    def test_replay_hole_raises_anchoring_error(self, spark, sink):
        from chesscom_etl_tableau_spark.plans.ingest import manifest_expire

        ldir = export_delta_log(spark, sink)
        # force the replay path (predecessor manifest expired), then
        # punch a hole BELOW the anchor: pre-r9 this hit an uncaught
        # FileNotFoundError mid-replay instead of the diagnostic
        manifest_expire(sink, keep_last=1)
        self._append(spark, sink, 4)
        manifest_expire(sink, keep_last=1)
        self._append(spark, sink, 5)
        os.remove(os.path.join(ldir, "00000000000000000000.json"))
        with pytest.raises(ValueError, match="anchored at version 0"):
            export_delta_log(spark, sink)

    def test_diverged_log_rejected_without_side_effects(self, spark, sink):
        ldir = export_delta_log(spark, sink)
        v1 = os.path.join(ldir, "00000000000000000001.json")
        os.remove(v1)
        v2 = os.path.join(ldir, "00000000000000000002.json")
        with open(v2, "w") as f:
            f.write('{"add": {"path": "bogus.parquet"}}\n')
        with pytest.raises(RuntimeError, match="diverged"):
            export_delta_log(spark, sink)
        # the rejected export must NOT have re-created v1 next to the
        # stale v2 (pre-r9 it wrote v1 first, then raised)
        assert not os.path.exists(v1)

    def test_metadata_json_divergence_raises(self, spark, sink):
        p1 = export_metadata_json(spark, sink)
        assert export_metadata_json(spark, sink) == p1  # idempotent
        with open(p1, "w") as f:
            f.write('{"tampered": true}')
        with pytest.raises(RuntimeError, match="diverged"):
            export_metadata_json(spark, sink)

    def test_single_slash_file_uri_is_local(self, spark, sink):
        # file:/abs/path — the form Spark/Hadoop emit — must resolve
        # like file:///abs/path instead of hitting the remote-URI guard
        assert len(snapshot_summaries(spark, "file:" + sink)) == 3
        assert len(snapshot_summaries(spark, "file://" + sink)) == 3
        with pytest.raises(ValueError, match="non-local authority"):
            snapshot_summaries(spark, "file://otherhost/x/y")


class TestHadoopIOExports:
    """The Hadoop FileSystem port (r9, verdict-r8 ask #8's strong form):
    `hadoop=True` routes every metadata read/write through
    `org.apache.hadoop.fs.FileSystem`, exercised here via the `file:`
    scheme (RawLocalFileSystem) — the same code path any other scheme
    takes once its connector + credentials are on the session."""

    def test_summaries_parity_local_vs_hadoop(self, spark, sink):
        a = snapshot_summaries(spark, sink)
        b = snapshot_summaries(spark, "file:" + sink, hadoop=True)
        keep = ("snapshot_id", "n_data_files", "n_delete_files",
                "total_records", "protocol", "is_current")
        assert [{k: s[k] for k in keep} for s in a] == [
            {k: s[k] for k in keep} for s in b
        ]

    def test_delta_export_through_hadoop_replays(self, spark, sink):
        ldir = export_delta_log(spark, "file:" + sink, hadoop=True)
        assert ldir.startswith("file:")
        local_ldir = os.path.join(sink, "_delta_log")
        names = sorted(os.listdir(local_ldir))
        assert names == [f"{v:020d}.json" for v in range(3)]
        live: set[str] = set()
        for v in names:
            with open(os.path.join(local_ldir, v)) as f:
                for line in f:
                    a = json.loads(line)
                    if "add" in a:
                        live.add(a["add"]["path"])
                    elif "remove" in a:
                        live.discard(a["remove"]["path"])
        flist = ", ".join(f"'{os.path.join(sink, p)}'" for p in sorted(live))
        n = duckdb.sql(f"select count(*) from read_parquet([{flist}])").fetchone()[0]
        assert n == read_manifest_sink(spark, sink).count()
        # re-export through the other adapter: bodies must be identical
        # (content is a pure function of manifest state, not of the IO)
        assert export_delta_log(spark, sink) == local_ldir

    def test_cross_adapter_paths_canonical_and_replay(self, spark, sink):
        """The hadoop adapter addresses the sink as a 'file:' URI while
        manifests store the committer's plain-path spelling; _rel_path
        must canonicalize BOTH to root-relative so (a) the URI export's
        log never carries absolute paths and (b) an os-adapter export of
        a later generation, replayed from the URI-written log after
        manifest expiry, sees textually identical prev/cur sets — no
        add+remove churn (ADVICE r9, metadata_export.py _rel_path)."""
        from chesscom_etl_tableau_spark.plans.ingest import manifest_expire

        export_delta_log(spark, "file:" + sink, hadoop=True)
        ldir = os.path.join(sink, "_delta_log")

        def actions(version):
            out = []
            with open(os.path.join(ldir, f"{version:020d}.json")) as f:
                for line in f:
                    out.append(json.loads(line))
            return out

        # (a) every path the URI export wrote is root-relative
        for v in range(3):
            for a in actions(v):
                for kind in ("add", "remove"):
                    if kind in a:
                        p = a[kind]["path"]
                        assert not p.startswith("/") and "://" not in p, (v, p)

        # (b) new generation + expire the predecessor manifest, then
        # export via the OS adapter: the replay branch must reconstruct
        # prev from the URI-written log in the same canonical form.
        ev = (
            load_table(spark, SF_DIR, "events")
            .where(F.col("event_id") % 7 == 3)
            .select(F.col("event_id").alias("game_url"), "user_id")
        )
        commit_append_manifest(ev.limit(20).coalesce(1).localCheckpoint(), sink)
        manifest_expire(sink, keep_last=1)
        export_delta_log(spark, sink)

        v3 = actions(3)
        # pure append: one add per new data file, ZERO removes, zero
        # re-adds of files already live in versions 0-2
        assert not any("remove" in a for a in v3), v3
        prior_live = set()
        for v in range(3):
            for a in actions(v):
                if "add" in a:
                    prior_live.add(a["add"]["path"])
                elif "remove" in a:
                    prior_live.discard(a["remove"]["path"])
        new_adds = [a["add"]["path"] for a in v3 if "add" in a]
        assert new_adds and not (set(new_adds) & prior_live)
        # foreign replay of the full mixed-adapter log matches the engine
        live = set(prior_live) | set(new_adds)
        flist = ", ".join(f"'{os.path.join(sink, p)}'" for p in sorted(live))
        got = duckdb.sql(f"select count(*) from read_parquet([{flist}])").fetchone()[0]
        assert got == read_manifest_sink(spark, sink).count()

    def test_metadata_json_through_hadoop_verifies(self, spark, sink):
        p = export_metadata_json(spark, "file:" + sink, hadoop=True)
        local_p = p[len("file:"):]
        with open(local_p) as f:
            doc = json.load(f)
        assert doc["format"] == "spark-graft-manifest/1"
        assert len(doc["snapshots"]) == 3
        # divergence raises through the hadoop adapter too
        with open(local_p, "w") as f:
            f.write('{"tampered": true}')
        with pytest.raises(RuntimeError, match="diverged"):
            export_metadata_json(spark, "file:" + sink, hadoop=True)


def _duckdb_delta_unavailable() -> str | None:
    """Capability probe for the duckdb `delta` extension. Returns None
    when a live delta_scan is possible, else the one-line reason."""
    try:
        con = duckdb.connect()
        con.execute("INSTALL delta")
        con.execute("LOAD delta")
        return None
    except Exception as e:  # noqa: BLE001 - any load failure gates the same way
        return f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"


class TestLiveDeltaScan:
    """Verdict-r11 ask #6: the LIVE foreign-engine read of the exported
    Delta log. The duckdb `delta` extension requires a network download
    this sandbox does not allow (probed again r12: 'IO Error: Failed to
    download extension "delta"'), and delta-rs is not installed either —
    so the test is capability-gated: the moment the environment provides
    the extension, CI gets the lists+reads proof with zero code change;
    until then it records the documented skip and the golden-file replay
    in TestDeltaLogForeignReader remains the protocol contract."""

    def test_duckdb_delta_scan_reads_export(self, spark, sink):
        reason = _duckdb_delta_unavailable()
        if reason:
            pytest.skip(f"duckdb delta extension unavailable: {reason}")
        export_delta_log(spark, sink)
        con = duckdb.connect()
        con.execute("LOAD delta")
        n = con.execute(f"SELECT count(*) FROM delta_scan('{sink}')").fetchone()[0]
        assert n == read_manifest_sink(spark, sink).count()
        got_sum = con.execute(
            f"SELECT sum(user_id) FROM delta_scan('{sink}')"
        ).fetchone()[0]
        want_sum = read_manifest_sink(spark, sink).agg(F.sum("user_id")).first()[0]
        assert got_sum == want_sum
