"""Build (or refresh) every warehouse index artifact for one corpus
snapshot — the production "train/ingest job" of the persist lifecycle
(scribedb_spark/persist.py): run it once after a snapshot lands, and
every later serving session (ANN search, BM25 retrieval, LM scoring,
dedup consumers, IBLT reconciliation) reloads the artifacts instead
of rebuilding.

    python scripts/build_indexes.py [sf_dir]

Each *_index_persist registry key IS the build-if-stale + serve step,
so this script simply drives them and reports, per artifact, whether
it was BUILT this run or RELOADED (fresh on disk), plus its on-disk
size. Idempotent: a second invocation reports zero builds unless the
snapshot's files, the builder parameters, or ARTIFACT_FORMAT changed.
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
    "lm_index_persist",
    "bm25_index_persist",
    "bm25_index_append",
    "compare_iblt_persist",
]


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
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
            sz = _dir_bytes(os.path.join(root, name))
            print(f"  {name:22s} {sz / 1024:10.1f} KiB")
    print(
        f"artifacts built this run: {len(persist.BUILD_EVENTS)}"
        f"  total {time.perf_counter() - t0:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
