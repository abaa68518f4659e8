"""Ecosystem-readable metadata export for the native manifest sink.

The manifest sink (``plans/ingest.py``, the object-store commit
protocol) keeps its own metadata layout: one
``_manifests/manifest-<gen>.json`` per published generation. That is
complete for THIS engine but opaque to others. This module exports a
read-only, Iceberg-style view of the same state (verdict-r5 ask #8):

- ``snapshot_log`` — a DataFrame with one row per published snapshot
  carrying the summary fields an Iceberg snapshot list carries
  (snapshot id, data/delete file counts, total data records, protocol
  version, current flag). ``total_records`` comes from parquet FOOTER
  metadata only — the export never reads data pages, exactly like a
  real table format's commit-time summary. Footer reads are
  DISTRIBUTED (``mapInPandas`` over the file list), so a snapshot with
  100k files costs one short Spark stage, not 100k driver round trips.
- ``export_metadata_json`` — writes ``_metadata/v<gen>.metadata.json``
  next to the sink: a versioned, engine-neutral JSON document
  (format marker, current snapshot id, snapshot list with manifest
  paths) that an external tool can parse to enumerate snapshots and
  their file lists without understanding this engine. The file is
  derived state: rebuilding it is always safe, and the exclusive-create
  publish means concurrent exporters of the same generation cannot
  interleave partial writes (first writer wins; the content is a pure
  function of the generation, so losing the race loses nothing).

Reference parity: the reference pipeline has no table format at all
(fetch_and_post.py appends bare parquet); this is part of the
beyond-reference manifest surface (S11..S21) and follows the metadata
layout conventions of the Apache Iceberg spec (public) without
depending on an Iceberg runtime.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.plans.ingest import (
    MANIFEST_PROTOCOL,
    _manifest_dir,
    _manifest_doc,
)

METADATA_FORMAT = "spark-graft-manifest/1"


def _require_local(sink_path: str) -> str:
    """The export walks manifests with os.listdir/open — LOCAL paths
    only, matching the manifest commit protocol itself (os.open with
    O_EXCL; plans/ingest.py). A remote URI would silently report "no
    published snapshots", so fail loudly instead; a ``file://`` URI is
    STRIPPED to the plain path os.* can resolve (previously it was
    waved through and hit the exact silent-empty failure the guard
    exists to prevent). Returns the normalized local path. Porting
    both layers to the Hadoop FileSystem API (streaming/
    heavy_stream.py shows the pattern) is the single switch that lifts
    this restriction."""
    if sink_path.startswith("file:/"):
        rest = sink_path[len("file:"):]
        # file:/abs/path (the single-slash form Spark/Hadoop emit),
        # file:///abs/path and file://localhost/abs/path are all local;
        # any other authority is a remote host.
        if rest.startswith("///"):
            return rest[2:]
        if rest.startswith("//localhost/"):
            return rest[len("//localhost"):]
        if rest.startswith("//"):
            raise ValueError(
                f"{sink_path}: file:// URI with a non-local authority"
            )
        return rest
    if "://" in sink_path:
        raise ValueError(
            f"{sink_path}: metadata export supports local-filesystem "
            "sinks only (the manifest commit protocol is os-based); "
            "got a remote URI"
        )
    return sink_path


def _published_generations(sink_path: str) -> list[int]:
    sink_path = _require_local(sink_path)
    mdir = _manifest_dir(sink_path)
    try:
        names = [n for n in os.listdir(mdir) if n.startswith("manifest-")]
    except FileNotFoundError:
        return []
    return sorted(
        int(n.removeprefix("manifest-").removesuffix(".json")) for n in names
    )


# Below this many files a Spark stage costs more than it saves: footer
# reads are ~ms each, and a mapInPandas round trip is ~1s of fixed
# scheduling/Arrow overhead. 64 keeps the driver's share trivially
# bounded (64 footer GETs) while large sinks go distributed.
_DRIVER_FOOTER_MAX = 64


def _footer_rows(spark: SparkSession, files: list[str]) -> dict[str, int]:
    """{file path: row count} from parquet footers only — no data pages.

    Small lists read on the driver (|files| bounded GETs); past
    ``_DRIVER_FOOTER_MAX`` the file list becomes a 1-column DataFrame
    and each executor slice reads its footers with pyarrow. Either way
    the result is |files| scalars (bounded metadata, not data rows)."""
    if not files:
        return {}
    if len(files) <= _DRIVER_FOOTER_MAX:
        import pyarrow.parquet as pq

        return {f: int(pq.ParquetFile(f).metadata.num_rows) for f in files}

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for b in batches:
            yield pd.DataFrame(
                {
                    "path": b["path"],
                    "n_rows": [
                        pq.ParquetFile(p).metadata.num_rows for p in b["path"]
                    ],
                }
            )

    # repartition so footer I/O spreads across executors instead of
    # serializing through one task (matters at 10^5 files / object
    # store latency; harmless locally).
    nparts = min(len(files), spark.sparkContext.defaultParallelism)
    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        nparts
    )
    out = fdf.mapInPandas(read_footers, "path string, n_rows long").collect()
    return {r["path"]: int(r["n_rows"]) for r in out}


def snapshot_summaries(spark: SparkSession, sink_path: str) -> list[dict]:
    """One summary dict per published generation (ascending).

    ``total_records`` counts rows in the snapshot's DATA files (footer
    metadata), with merge-on-read deletes reported separately via
    ``n_delete_files`` — the same split Iceberg's snapshot summary
    makes (``total-records`` vs ``total-delete-files``)."""
    sink_path = _require_local(sink_path)
    gens = _published_generations(sink_path)
    if not gens:
        return []
    docs = {g: _manifest_doc(sink_path, g) for g in gens}
    all_files = sorted({f for d in docs.values() for f in d.get("files", [])})
    rows_by_file = _footer_rows(spark, all_files)
    current = gens[-1]
    out = []
    for g in gens:
        doc = docs[g]
        files = list(doc.get("files", []))
        out.append(
            {
                "snapshot_id": g,
                "manifest": os.path.join(
                    _manifest_dir(sink_path), f"manifest-{g:012d}.json"
                ),
                "n_data_files": len(files),
                "n_delete_files": len(doc.get("delete_files", [])),
                "total_records": sum(rows_by_file[f] for f in files),
                "protocol": int(doc.get("protocol", 1)),
                "is_current": g == current,
            }
        )
    return out


def snapshot_log(
    spark: SparkSession, sink_path: str, summaries: list[dict] | None = None
) -> DataFrame:
    """The snapshot list as a DataFrame (ascending snapshot_id).

    The manifest PATH is deliberately absent: it embeds the sink's
    filesystem location, which is run-dependent; the registry query
    built on this frame must stay value-deterministic. Pass
    ``summaries`` to reuse an already-computed ``snapshot_summaries``
    result (the footer scan is the expensive part — callers doing
    export + log should run it once)."""
    if summaries is None:
        summaries = snapshot_summaries(spark, sink_path)
    schema = (
        "snapshot_id bigint, n_data_files bigint, n_delete_files bigint, "
        "total_records bigint, protocol bigint, is_current boolean"
    )
    if not summaries:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        [
            (
                s["snapshot_id"],
                s["n_data_files"],
                s["n_delete_files"],
                s["total_records"],
                s["protocol"],
                s["is_current"],
            )
            for s in summaries
        ],
        schema,
    )


def export_metadata_json(
    spark: SparkSession, sink_path: str, summaries: list[dict] | None = None
) -> str:
    """Write ``_metadata/v<current_gen>.metadata.json`` and return its
    path. Exclusive create: the content is a pure function of the
    generation, so a lost race means the file already holds exactly
    what we were about to write. Returns the existing path in that
    case. Raises ValueError on an empty sink (no snapshot to export).
    ``summaries`` reuses a precomputed ``snapshot_summaries`` result."""
    sink_path = _require_local(sink_path)
    if summaries is None:
        summaries = snapshot_summaries(spark, sink_path)
    if not summaries:
        raise ValueError(f"{sink_path}: no published snapshots to export")
    current = summaries[-1]["snapshot_id"]
    doc = {
        "format": METADATA_FORMAT,
        "protocol": MANIFEST_PROTOCOL,
        "location": sink_path,
        "current_snapshot_id": current,
        "snapshots": summaries,
    }
    mdir = os.path.join(sink_path, "_metadata")
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"v{current:012d}.metadata.json")
    body = json.dumps(doc, indent=1, sort_keys=True)
    try:
        with open(path, "x") as f:
            f.write(body)
    except FileExistsError:
        # Same divergence check the Delta exporter does: the content is
        # a pure function of the generation, so a lost race must find
        # byte-identical content — anything else means the metadata dir
        # has drifted from the manifests it claims to describe.
        with open(path) as f:
            existing = f.read()
        if existing != body:
            raise RuntimeError(
                f"{path}: existing metadata file does not match the "
                "manifest-derived content — the export has diverged "
                "from the sink (was it edited, or written against "
                "since-expired manifests?)"
            ) from None
    return path


def _rel_path(sink_path: str, f: str) -> str:
    """Delta `path` fields are table-root-relative when possible;
    files living outside the sink keep their absolute path (the Delta
    protocol allows either)."""
    root = os.path.abspath(sink_path)
    af = os.path.abspath(f)
    return os.path.relpath(af, root) if af.startswith(root + os.sep) else af


def export_delta_log(spark: SparkSession, sink_path: str) -> str:
    """Write a minimal Delta-protocol transaction log (`_delta_log/
    <version>.json`, one newline-delimited JSON action per line) next
    to the native manifest sink, so Delta-ecosystem readers can
    enumerate the table without understanding this engine — the
    sibling of the Iceberg-style ``export_metadata_json`` (both are
    derived, read-only views of the same manifest state; the JSON
    action format is the public Delta protocol spec, no library
    involved).

    Mapping: published generation g -> Delta version g-1, derived from
    the GENERATION NUMBER (generations are 1-based and monotonic), not
    from the position of g in the currently-surviving manifest list —
    after ``manifest_expire`` retires old generations the list index
    shifts, and an index-based mapping would re-write old version
    numbers with new content while new generations collide with
    existing files. Version 0 carries ``protocol`` + ``metaData``
    (deterministic uuid5 table id; ``schemaString`` is the Spark
    schema JSON of the first data file's footer — the same
    representation Delta uses); every version carries ``add`` actions
    for files new to that generation and ``remove`` actions for files
    a COW rewrite dropped. Timestamps are file mtimes, so the content
    is a pure function of the on-disk state.

    Incremental re-export: version files that already exist are the
    durable anchor — their bodies are NEVER rebuilt (so data files a
    later ``manifest_gc`` deleted are never stat'ed), and the previous
    generation's file set for the first NEW version is reconstructed
    by replaying the existing log when its manifest has been expired.
    A lost exclusive-create race verifies the existing content matches
    what we were about to write and raises on divergence instead of
    silently keeping a stale log.

    Refuses sinks whose current generation carries merge-on-read
    delete vectors: a minimal log cannot express them, and exporting
    the raw file list would resurrect deleted rows for foreign
    readers. Compact or COW-merge first. Refuses a FIRST export whose
    generation-1 manifest has already been expired: the Delta log must
    start at version 0, and that history is gone.
    """
    import uuid

    sink_path = _require_local(sink_path)
    gens = _published_generations(sink_path)
    if not gens:
        raise ValueError(f"{sink_path}: no published snapshots to export")
    docs = {g: _manifest_doc(sink_path, g) for g in gens}
    for g in gens:
        if docs[g].get("delete_files"):
            raise ValueError(
                f"{sink_path}: generation {g} carries merge-on-read delete "
                "vectors, which a minimal Delta log cannot express — "
                "compact (commit_compact_manifest) before exporting"
            )
    ldir = os.path.join(sink_path, "_delta_log")
    os.makedirs(ldir, exist_ok=True)

    def _vpath(version: int) -> str:
        return os.path.join(ldir, f"{version:020d}.json")

    # Generations whose version file is missing are the ones to export.
    todo = [g for g in gens if not os.path.exists(_vpath(g - 1))]
    if not todo:
        return ldir
    first_new = todo[0]

    # File set of the generation PRECEDING the first new version: from
    # its surviving manifest if we have it, else replayed from the
    # already-exported log (the anchor). ALL set arithmetic happens in
    # the log's own canonical path form (`_rel_path`: root-relative
    # when under the sink, absolute otherwise) — manifest `files`
    # entries store whatever spelling the committer passed, so
    # normalizing only one side would make prev and cur textually
    # disjoint (every live file emitting add+remove in one version and
    # foreign readers replaying to an empty table).
    root = os.path.abspath(sink_path)

    def _canon(f: str) -> str:
        return _rel_path(sink_path, f)

    def _resolve(p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(root, p)

    if first_new == 1:
        prev: set[str] = set()
    elif (first_new - 1) in docs:
        prev = {_canon(f) for f in docs[first_new - 1].get("files", [])}
    else:
        # Replay needs the log to be whole: a hole anywhere below the
        # anchor (an externally deleted version file) silently drops
        # that version's adds, so check the full range up front and
        # raise the anchoring diagnostic instead of an open() error
        # mid-replay.
        missing = [v for v in range(first_new - 1) if not os.path.exists(_vpath(v))]
        if missing:
            raise ValueError(
                f"{sink_path}: generation {first_new - 1} has been expired "
                f"and the exported log is missing version(s) "
                f"{missing} — the Delta log cannot be anchored at "
                "version 0; export before expiring history"
            )
        prev = set()
        for v in range(first_new - 1):
            with open(_vpath(v)) as fh:
                for line in fh:
                    a = json.loads(line)
                    if "add" in a:
                        prev.add(a["add"]["path"])
                    elif "remove" in a:
                        prev.discard(a["remove"]["path"])

    schema_json = None
    table_id = str(uuid.uuid5(uuid.NAMESPACE_URL, root))
    # From the first missing version onward, walk EVERY surviving
    # generation (not just the missing ones) so `prev` tracks the
    # true predecessor even across a non-contiguous gap. Bodies are
    # computed for the WHOLE range first and existing files verified
    # before anything is created: a diverged log is rejected with zero
    # side effects instead of gaining fresh early versions next to the
    # stale late ones it keeps.
    bodies: list[tuple[int, str]] = []
    for g in gens[gens.index(first_new):]:
        cur = {_canon(f) for f in docs[g].get("files", [])}
        actions: list[dict] = []
        if g == 1:
            if schema_json is None:
                first_files = sorted(cur)
                schema_json = spark.read.parquet(
                    _resolve(first_files[0])
                ).schema.json()
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_json,
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": int(
                            os.path.getmtime(
                                os.path.join(
                                    _manifest_dir(sink_path),
                                    "manifest-000000000001.json",
                                )
                            )
                            * 1000
                        ),
                    }
                }
            )
        for f in sorted(cur - prev):
            actions.append(
                {
                    "add": {
                        "path": f,
                        "partitionValues": {},
                        "size": os.path.getsize(_resolve(f)),
                        "modificationTime": int(
                            os.path.getmtime(_resolve(f)) * 1000
                        ),
                        "dataChange": True,
                    }
                }
            )
        for f in sorted(prev - cur):
            actions.append(
                {
                    "remove": {
                        "path": f,
                        # the rewrite's commit time = its manifest mtime
                        "deletionTimestamp": int(
                            os.path.getmtime(
                                os.path.join(
                                    _manifest_dir(sink_path),
                                    f"manifest-{g:012d}.json",
                                )
                            )
                            * 1000
                        ),
                        "dataChange": True,
                    }
                }
            )
        body = "\n".join(json.dumps(a, sort_keys=True) for a in actions) + "\n"
        bodies.append((g, body))
        prev = cur

    # Verify pass: every version file that already exists in the range
    # must match its recomputed body BEFORE any new file is created.
    for g, body in bodies:
        vp = _vpath(g - 1)
        if os.path.exists(vp):
            with open(vp) as fh:
                existing = fh.read()
            if existing != body:
                raise RuntimeError(
                    f"{vp}: existing Delta version file does not "
                    "match the manifest-derived content — the log has "
                    "diverged from the sink (was it exported with a "
                    "pre-generation-anchored exporter, or edited?)"
                )
    # Write pass: exclusive create; a race lost between the passes
    # still content-verifies (the body is a pure function of the
    # manifest state, so a concurrent exporter wrote the same bytes).
    for g, body in bodies:
        vp = _vpath(g - 1)
        try:
            with open(vp, "x") as fh:
                fh.write(body)
        except FileExistsError:
            with open(vp) as fh:
                existing = fh.read()
            if existing != body:
                raise RuntimeError(
                    f"{vp}: existing Delta version file does not "
                    "match the manifest-derived content — the log has "
                    "diverged from the sink (concurrent writer raced "
                    "with different content?)"
                ) from None
    return ldir
