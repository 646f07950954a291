"""Cross-session persistence for build-once index artifacts.

:mod:`scribedb_spark.cache` holds trained/checkpointed artifacts for
ONE SparkSession; at 100 TB an index outlives the job that built it —
the training job writes it to warehouse parquet once and every serving
job (and every later session) RELOADS it instead of rebuilding. This
module is that lifecycle step:

- :func:`save_artifact` / :func:`load_artifact`: parquet + a JSON meta
  sidecar carrying a format version, the builder's parameter spec and
  a fingerprint of the source files. A reload is served ONLY when all
  three match — a changed corpus snapshot, a bumped builder, or
  different training parameters each invalidate the artifact loudly
  (rebuild, never serve stale).
- :func:`persisted_artifact`: the one-call wrapper — load if fresh,
  else build + save + reload. The returned frame ALWAYS reads the
  warehouse parquet (even right after a build), so the serve plan is
  pinned to a FileScan of the artifact and can never silently fall
  back to the builder's plan (plan-asserted in tests/test_plans.py).

Reference analog: the reference persists its per-run aggregate into
the target database once per run (scribedb/postgres.py:65-67) rather
than rebuilding per query; here the persisted artifacts are the
engine's trained indexes (LSH pair index, IVF codebook + assigned
table, PQ codes, LM count tables, BM25 postings, IBLT sketch),
proven by oracle-backed round-trip keys (`*_index_persist`) plus a
two-real-SparkSessions subprocess test.

Concurrency: two processes building the same artifact race benignly —
every builder is deterministic over the fingerprinted sources, so
both writers produce identical bytes and the worst case is one wasted
build (the sidecar-last ordering means a reader never sees a
half-written artifact as valid). Warehouse slots key on the sf_dir
BASENAME: two different corpora sharing a basename would ping-pong
rebuilds (fingerprint mismatch each time) — correct, just uncached;
point $SPARK_GRAFT_WAREHOUSE somewhere distinct per corpus family if
that ever matters.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

#: bump when any persisted builder's OUTPUT contract changes — stale
#: on-disk artifacts from an older code version must rebuild, not serve.
#: v2: sidecars record the source-file list (GC + catalog contract);
#: v1 sidecars lack it, so they must rebuild rather than serve with an
#: unauditable provenance.
ARTIFACT_FORMAT = 2

_META_NAME = "_ARTIFACT_META.json"

#: every ACTUAL build (cache miss -> builder ran -> artifact written)
#: appends (name, dest) here so the cross-session test can assert a
#: fresh process served entirely from the warehouse (zero builds)
BUILD_EVENTS: list = []


def warehouse_dir() -> str:
    """Artifact warehouse root: $SPARK_GRAFT_WAREHOUSE, defaulting to
    <repo>/spark-warehouse/artifacts (tests point it at a tmp dir)."""
    env = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo, "spark-warehouse", "artifacts")


def source_fingerprint(paths: list[str]) -> str:
    """md5 over every source file's (relative name, size, mtime_ns) —
    cheap stat-only staleness signal; any corpus change rebuilds."""
    entries = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                dirs.sort()  # canonical traversal: listdir order varies
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    entries.append(
                        (os.path.relpath(fp, p), st.st_size, st.st_mtime_ns)
                    )
        else:
            st = os.stat(p)
            entries.append((os.path.basename(p), st.st_size, st.st_mtime_ns))
    return hashlib.md5(json.dumps(entries).encode()).hexdigest()


def artifact_path(name: str, sf_dir: str) -> str:
    """Warehouse slot for one artifact of one corpus snapshot."""
    return os.path.join(warehouse_dir(), os.path.basename(sf_dir.rstrip("/")), name)


def save_artifact(
    df: DataFrame, dest: str, meta: dict, extra: dict | None = None
) -> None:
    """Write the artifact parquet, then the meta sidecar. The sidecar
    is written LAST: a crash mid-write leaves a meta-less directory
    that load_artifact treats as absent (rebuild, never half-read).
    ``extra`` carries informational sidecar fields (source paths,
    catalog annotations) that do NOT participate in the staleness
    match — load_artifact compares only the expected keys."""
    df.write.mode("overwrite").parquet(dest)
    tmp = os.path.join(dest, _META_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({**(extra or {}), **meta}, fh, sort_keys=True)
    os.replace(tmp, os.path.join(dest, _META_NAME))


def read_sidecar(dest: str) -> dict | None:
    """The artifact's meta sidecar, or None when absent/unparseable
    (== the artifact is half-written and must be treated as absent)."""
    meta_file = os.path.join(dest, _META_NAME)
    if not os.path.exists(meta_file):
        return None
    try:
        with open(meta_file) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def load_artifact(
    spark: SparkSession, dest: str, expect_meta: dict
) -> DataFrame | None:
    """The reloaded artifact frame, or None when absent or stale
    (missing sidecar, or any EXPECTED meta field differing from the
    format/spec/source fingerprint — informational sidecar fields are
    ignored by the match)."""
    found = read_sidecar(dest)
    if found is None:
        return None
    if any(found.get(k) != v for k, v in expect_meta.items()):
        return None
    return spark.read.parquet(dest)


def persisted_artifact(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    sources: list[str],
    builder: Callable[[], DataFrame],
    spec: dict | None = None,
) -> DataFrame:
    """Load ``name`` for the ``sf_dir`` snapshot from the warehouse,
    building + saving it first iff absent or stale. ``sources`` are
    the files the artifact derives from (staleness fingerprint);
    ``spec`` carries the builder's parameters (a param change is a
    different artifact). Always returns a frame READING the warehouse
    parquet — never the builder's plan."""
    dest = artifact_path(name, sf_dir)
    meta = {
        "format": ARTIFACT_FORMAT,
        "name": name,
        "spec": spec or {},
        "source_fp": source_fingerprint(sources),
    }
    df = load_artifact(spark, dest, meta)
    if df is None:
        save_artifact(builder(), dest, meta, extra={"sources": sources})
        BUILD_EVENTS.append((name, dest))
        df = spark.read.parquet(dest)
    return df


def _artifact_data_files(dest: str) -> list[str]:
    """The artifact's visible parquet data files (what a reader
    lists): top-level *.parquet, excluding underscore/dot-prefixed
    entries (sidecar, _SUCCESS, staging dirs)."""
    try:
        names = os.listdir(dest)
    except OSError:
        return []
    return sorted(
        f
        for f in names
        if f.endswith(".parquet")
        and not f.startswith(("_", "."))
        and os.path.isfile(os.path.join(dest, f))
    )


def compact_artifact(
    spark: SparkSession,
    dest: str,
    max_files: int = 32,
    target_files: int = 4,
    allow_stream_owned: bool = False,
) -> bool:
    """Rewrite an artifact whose data-file count exceeded
    ``max_files`` into ``target_files`` files; returns whether a
    rewrite happened. The streamed-append maintenance path
    (streaming/diff.py stream_postings_persist) lands one small file
    set per micro-batch — at 100 TB that is the classic small-files
    death (every serving scan pays per-file open/footer costs, the
    driver pays per-file listing). Compaction is the other half of
    that lifecycle: content-preserving (the exact row multiset is
    rewritten — nothing is re-aggregated, so compacted == uncompacted
    for every reader), sidecar-preserving (staleness identity is
    untouched), and idempotent (after a rewrite the file count is
    back under the threshold).

    Single-writer maintenance step, like the stream sink itself: run
    it from the ingest/maintenance job, not concurrently with an
    active appender; in-session frames already pinned to the old file
    list must be re-read. The rewrite stages to an underscore dir
    (invisible to readers) and only then swaps files. Crash safety
    leans on the sidecar-is-written-LAST invariant: the sidecar is
    LIFTED OUT before the first destructive step and restored only
    after the swap completes, so a crash anywhere inside the window
    leaves a sidecar-less directory that load_artifact/gc classify as
    a half-written build (rebuild, never serve) instead of silently
    serving partial data. An object-store deployment swaps this step
    for the table format's rewrite/commit protocol.

    STREAM-OWNED artifacts (any ``batch-*.parquet`` data file — the
    stream_postings_persist naming) are REFUSED by default: folding
    batch-N files into compact-* names breaks the replay-delete guard
    (an at-least-once redelivery of batch N would find nothing to
    delete and re-append its rows — a silent permanent double count).
    Pass ``allow_stream_owned=True`` only from a maintenance step that
    knows the stream is stopped with its checkpoint committed."""
    import glob
    import shutil

    files = _artifact_data_files(dest)
    if len(files) <= max_files:
        return False
    if not allow_stream_owned and any(f.startswith("batch-") for f in files):
        return False
    stage = os.path.join(dest, "_compact_stage")
    # a crash between staging and the sidecar lift leaves a stale
    # stage dir inside a still-servable artifact (invisible to readers
    # but inflating size reports forever) — clear it before re-staging
    shutil.rmtree(stage, ignore_errors=True)
    (
        spark.read.parquet(dest)
        .repartition(target_files)
        .write.mode("overwrite")
        .parquet(stage)
    )
    sidecar = os.path.join(dest, _META_NAME)
    lifted = os.path.join(dest, "_compact_meta_lifted")
    os.replace(sidecar, lifted)
    for f in files:
        os.remove(os.path.join(dest, f))
    parts = sorted(glob.glob(os.path.join(stage, "part-*.parquet")))
    for k, p in enumerate(parts):
        os.replace(p, os.path.join(dest, f"compact-{k:05d}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)
    os.replace(lifted, sidecar)
    return True


def gc_warehouse(delete: bool = False, root: str | None = None) -> list[dict]:
    """Census every artifact slot in the warehouse (``root`` overrides
    :func:`warehouse_dir` — the planted-fixture census key and tests
    point it at a temp warehouse) and classify it fresh or stale; with
    ``delete=True`` remove the stale ones. Stale
    artifacts otherwise accumulate forever — every run against a
    refreshed corpus snapshot or a bumped ARTIFACT_FORMAT strands the
    old directory (persisted_artifact rebuilds beside it, it never
    cleans up). Staleness mirrors load_artifact's guards exactly:

    - ``no_sidecar`` / ``bad_sidecar``: half-written build (crash
      before the sidecar landed) — never servable.
    - ``format``: built by an older ARTIFACT_FORMAT — a format bump
      means the builder's output contract changed; must rebuild.
    - ``missing_source`` / ``stale_source``: the recorded source
      files are gone or their stat-fingerprint changed — the corpus
      snapshot moved on. (Sidecars from before the sources field was
      recorded can't be source-checked; they stay until a format
      bump.)

    Returns one record per slot: {artifact, stale, reason, deleted}."""
    import shutil

    out: list[dict] = []
    if root is None:
        root = warehouse_dir()
    if not os.path.isdir(root):
        return out
    for snap in sorted(os.listdir(root)):
        snap_dir = os.path.join(root, snap)
        if not os.path.isdir(snap_dir):
            continue
        for name in sorted(os.listdir(snap_dir)):
            dest = os.path.join(snap_dir, name)
            if not os.path.isdir(dest):
                continue
            reason = None
            meta = read_sidecar(dest)
            if meta is None:
                reason = (
                    "bad_sidecar"
                    if os.path.exists(os.path.join(dest, _META_NAME))
                    else "no_sidecar"
                )
            elif meta.get("format") != ARTIFACT_FORMAT:
                reason = "format"
            else:
                srcs = meta.get("sources")
                if srcs is not None:
                    if not all(os.path.exists(s) for s in srcs):
                        reason = "missing_source"
                    elif source_fingerprint(srcs) != meta.get("source_fp"):
                        reason = "stale_source"
            rec = {
                "artifact": f"{snap}/{name}",
                "stale": reason is not None,
                "reason": reason,
                "deleted": False,
            }
            if reason is not None and delete:
                shutil.rmtree(dest, ignore_errors=True)
                rec["deleted"] = True
            out.append(rec)
    return out


#: compaction policy: an artifact whose visible file count exceeds
#: max(_ADVISOR_FLOOR_FILES, ideal) should be rewritten; ideal is the
#: footer-row count at ~4M rows/file (the 100 TB sizing where a file
#: is one comfortable scan task), floored at one file
_ADVISOR_ROWS_PER_FILE = 4_194_304
_ADVISOR_FLOOR_FILES = 4


def compaction_advice(
    n_files: int, n_rows: int, stream_owned: bool
) -> tuple[str, int]:
    """(verdict, ideal_files) for one artifact census row — the ONE
    policy the advisor key, the unit tests and build_indexes.py share,
    so deciding WHEN to run compact_artifact stops being manual.

    - ``stream_owned`` (any batch-* data file): verdict
      'stream_owned' — compaction would break the replay-delete guard
      (see compact_artifact); the stream's own maintenance window owns
      the rewrite.
    - more files than max({4}, ideal): 'compact' — per-file open/
      footer/listing costs dominate the scan (the streamed-append
      small-files death, or a historical many-partition write).
    - otherwise 'ok'.

    ideal_files = ceil(n_rows / {4M}) floored at 1 — integer-only so
    the advisor's oracle can pin verdicts as literals."""
    ideal = max(1, (n_rows + _ADVISOR_ROWS_PER_FILE - 1) // _ADVISOR_ROWS_PER_FILE)
    if stream_owned:
        return "stream_owned", ideal
    if n_files > max(_ADVISOR_FLOOR_FILES, ideal):
        return "compact", ideal
    return "ok", ideal


def artifact_file_census(dest: str) -> tuple[int, int, bool]:
    """(n_files, n_rows, stream_owned) for one artifact directory —
    driver-side parquet-footer probe (row counts are footer metadata;
    zero Spark jobs, no data pages read), the catalog key's probing
    discipline."""
    import pyarrow.parquet as pq

    files = _artifact_data_files(dest)
    n_rows = 0
    for f in files:
        try:
            n_rows += pq.ParquetFile(os.path.join(dest, f)).metadata.num_rows
        except OSError:
            pass
    return len(files), n_rows, any(f.startswith("batch-") for f in files)
