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
#: on-disk artifacts from an older code version must rebuild, not serve
ARTIFACT_FORMAT = 1

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


def save_artifact(df: DataFrame, dest: str, meta: dict) -> None:
    """Write the artifact parquet, then the meta sidecar. The sidecar
    is written LAST: a crash mid-write leaves a meta-less directory
    that load_artifact treats as absent (rebuild, never half-read)."""
    df.write.mode("overwrite").parquet(dest)
    tmp = os.path.join(dest, _META_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, sort_keys=True)
    os.replace(tmp, os.path.join(dest, _META_NAME))


def load_artifact(
    spark: SparkSession, dest: str, expect_meta: dict
) -> DataFrame | None:
    """The reloaded artifact frame, or None when absent or stale
    (missing sidecar, or any meta field differing from the expected
    format/spec/source fingerprint)."""
    meta_file = os.path.join(dest, _META_NAME)
    if not os.path.exists(meta_file):
        return None
    try:
        with open(meta_file) as fh:
            found = json.load(fh)
    except (OSError, ValueError):
        return None
    if found != expect_meta:
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
        save_artifact(builder(), dest, meta)
        BUILD_EVENTS.append((name, dest))
        df = spark.read.parquet(dest)
    return df
