"""Build (or refresh) every warehouse index artifact for one corpus
snapshot — the production "train/ingest job" of the persist lifecycle
(scribedb_spark/persist.py): run it once after a snapshot lands, and
every later serving session (ANN search, BM25 retrieval, LM scoring,
dedup consumers, IBLT reconciliation) reloads the artifacts instead
of rebuilding.

    python scripts/build_indexes.py [sf_dir] [--gc]

Each *_index_persist registry key IS the build-if-stale + serve step,
so this script simply drives them and reports, per artifact, whether
it was BUILT this run or RELOADED (fresh on disk), plus its on-disk
size. Idempotent: a second invocation reports zero builds unless the
snapshot's files, the builder parameters, or ARTIFACT_FORMAT changed.

After the build pass the script runs the other two lifecycle steps:
- COMPACTION (persist.compact_artifact): any artifact whose data-file
  count exceeded the threshold (streamed appends accumulate one file
  set per micro-batch) is rewritten content-identically into a few
  files.
- GC census (persist.gc_warehouse): every warehouse slot is
  classified fresh/stale (missing/old-format sidecar, missing or
  fingerprint-drifted sources). Stale slots are DELETED only with
  --gc; without it they are just reported.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PERSIST_KEYS = [
    "dedup_index_persist",
    "ann_index_persist",
    "ann_pq_persist",
    "ann_mips_persist",
    "lm_index_persist",
    "bm25_index_persist",
    "bm25_index_append",
    "compare_iblt_persist",
    "dedup_rewrite_persist",
    "paragraph_index_persist",
]


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main(sf_dir: str = "/root/testdata/sf0.01", gc: bool = False) -> None:
    from scribedb_spark import persist
    from scribedb_spark import queries as Q
    from scribedb_spark.session import get_spark

    Q.load_extensions()
    spark = get_spark(app_name="build-indexes")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    for key in PERSIST_KEYS:
        before = len(persist.BUILD_EVENTS)
        t1 = time.perf_counter()
        n = Q.REGISTRY[key].fn(spark, sf_dir).count()
        dt = time.perf_counter() - t1
        fresh = persist.BUILD_EVENTS[before:]
        status = (
            "BUILT " + ", ".join(name for name, _ in fresh)
            if fresh
            else "reloaded"
        )
        print(f"{key:24s} {dt:6.2f}s  {n:>8} rows  {status}")
    root = os.path.join(
        persist.warehouse_dir(), os.path.basename(sf_dir.rstrip("/"))
    )
    print(f"\nwarehouse: {root}")
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            dest = os.path.join(root, name)
            sz = _dir_bytes(dest)
            # the layout_compaction_advisor policy decides per slot:
            # compact (file count above max(4, ideal)), stream_owned
            # (batch-* files — the stream's maintenance window owns
            # the rewrite), or ok
            nf, n_rows, stream_owned = persist.artifact_file_census(dest)
            verdict, ideal = persist.compaction_advice(
                nf, n_rows, stream_owned
            )
            note = ""
            if verdict == "compact":
                did = persist.compact_artifact(
                    spark,
                    dest,
                    max_files=max(persist._ADVISOR_FLOOR_FILES, ideal),
                    target_files=ideal,
                )
                nf_after = len(persist._artifact_data_files(dest))
                # only claim a compaction that actually happened (r11
                # ADVICE): compact_artifact refuses internally on a
                # race (file count back under max, batch-* appearing)
                note = (
                    f"  COMPACTED {nf} -> {nf_after} files"
                    if did
                    else f"  compaction skipped ({nf_after} files)"
                )
            elif verdict == "stream_owned":
                note = "  stream-owned (skipped)"
            print(f"  {name:22s} {sz / 1024:10.1f} KiB  {nf:>4} files{note}")
    census = persist.gc_warehouse(delete=gc)
    stale = [r for r in census if r["stale"]]
    for r in stale:
        verb = "DELETED" if r["deleted"] else "stale"
        print(f"  {verb}: {r['artifact']} ({r['reason']})")
    print(
        f"artifacts built this run: {len(persist.BUILD_EVENTS)}"
        f"  stale: {len(stale)}{' (use --gc to delete)' if stale and not gc else ''}"
        f"  total {time.perf_counter() - t0:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--gc"]
    main(*argv[:1], gc="--gc" in sys.argv[1:])
