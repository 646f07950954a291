"""Persist-and-reload index lifecycle (scribedb_spark/persist.py).

The session cache (cache.py) dies with the SparkSession; at 100 TB a
trained index outlives the job that built it. These tests pin the
warehouse layer: build-once semantics, the three staleness guards
(source fingerprint, parameter spec, format version), and — the real
proof — a round trip across TWO REAL SparkSessions in separate
subprocesses: session A builds + saves, session B serves identical
results with ZERO builds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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


def test_persisted_artifact_builds_once_then_reloads(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    from scribedb_spark import persist

    src = tmp_path / "corpus"
    src.mkdir()
    f = src / "part-0.txt"
    f.write_text("v1")
    builds = []

    def builder():
        builds.append(1)
        return spark.range(5).selectExpr("id", "id * 2 as v")

    def call(spec=None):
        return persist.persisted_artifact(
            spark, "toy", "/data/sfX", [str(src)], builder, spec or {"p": 1}
        )

    assert sorted(r["v"] for r in call().collect()) == [0, 2, 4, 6, 8]
    call()
    assert len(builds) == 1  # second call served from the warehouse

    # changed spec -> different artifact -> rebuild
    call(spec={"p": 2})
    assert len(builds) == 2

    # mutated source file -> fingerprint mismatch -> rebuild
    f.write_text("v2 longer")
    call(spec={"p": 2})
    assert len(builds) == 3

    # format bump -> rebuild (stale artifacts from older code never serve)
    monkeypatch.setattr(persist, "ARTIFACT_FORMAT", persist.ARTIFACT_FORMAT + 1)
    call(spec={"p": 2})
    assert len(builds) == 4


def test_half_written_artifact_treated_as_absent(spark, tmp_path, monkeypatch):
    """A crash between parquet write and sidecar write must read as
    'absent' (rebuild), never as a half-readable artifact."""
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    from scribedb_spark import persist

    src = tmp_path / "s.txt"
    src.write_text("x")
    builds = []

    def builder():
        builds.append(1)
        return spark.range(3).selectExpr("id")

    persist.persisted_artifact(spark, "toy", "/d/sfY", [str(src)], builder)
    os.remove(os.path.join(persist.artifact_path("toy", "/d/sfY"), "_ARTIFACT_META.json"))
    persist.persisted_artifact(spark, "toy", "/d/sfY", [str(src)], builder)
    assert len(builds) == 2


SESSION_SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("persist-roundtrip")
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import hashlib, json
from scribedb_spark import persist
from scribedb_spark.queries import queries

qs = queries()
out = {}
for k in %(keys)r:
    rows = sorted(map(repr, qs[k](spark, %(sf)r).collect()))
    out[k] = hashlib.md5("\n".join(rows).encode()).hexdigest()
print("RESULT", json.dumps({"hashes": out, "builds": len(persist.BUILD_EVENTS)}))
"""


def test_cross_session_round_trip(sf_dir, tmp_path):
    """Session A (fresh subprocess) builds + persists every artifact;
    session B (another fresh subprocess, new SparkSession, new
    applicationId) must serve hash-identical results for all three
    persist keys with ZERO builds — the save -> load -> serve
    lifecycle the session cache cannot provide."""
    env = dict(os.environ, SPARK_GRAFT_WAREHOUSE=str(tmp_path / "wh"))
    code = SESSION_SCRIPT % {"repo": REPO, "keys": PERSIST_KEYS, "sf": sf_dir}

    def run():
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=480,
            cwd=REPO,
            env=env,
        )
        out = proc.stdout + proc.stderr
        assert proc.returncode == 0, out[-2000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        assert line, out[-2000:]
        return json.loads(line[-1][len("RESULT "):])

    first = run()
    assert first["builds"] > 0  # session A actually trained + saved
    second = run()
    assert second["builds"] == 0, "fresh session rebuilt instead of reloading"
    assert second["hashes"] == first["hashes"]

def test_sidecar_extra_fields_do_not_break_match(spark, tmp_path, monkeypatch):
    """Informational sidecar fields (the recorded source list, any
    future catalog annotation) must not participate in the staleness
    match — only the expected format/spec/fingerprint keys do."""
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    from scribedb_spark import persist

    src = tmp_path / "s.txt"
    src.write_text("x")
    builds = []

    def builder():
        builds.append(1)
        return spark.range(3).selectExpr("id")

    persist.persisted_artifact(spark, "toy", "/d/sfZ", [str(src)], builder)
    dest = persist.artifact_path("toy", "/d/sfZ")
    side = persist.read_sidecar(dest)
    assert side["sources"] == [str(src)]  # provenance recorded
    # a reload (second call) serves despite the extra sidecar fields
    persist.persisted_artifact(spark, "toy", "/d/sfZ", [str(src)], builder)
    assert len(builds) == 1


def test_compact_artifact_preserves_rows_and_sidecar(spark, tmp_path, monkeypatch):
    """Compaction: a many-file artifact (streamed appends) rewrites to
    few files with the EXACT row multiset, an untouched sidecar (the
    staleness identity), and idempotence (second call is a no-op)."""
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    from scribedb_spark import persist

    src = tmp_path / "s.txt"
    src.write_text("x")
    persist.persisted_artifact(
        spark,
        "posts",
        "/d/sfC",
        [str(src)],
        lambda: spark.range(100).selectExpr("id", "id * 3 as v"),
    )
    dest = persist.artifact_path("posts", "/d/sfC")
    # simulate 40 streamed micro-batch appends of one row each
    for i in range(40):
        spark.range(1000 + i, 1001 + i).selectExpr(
            "id", "id * 3 as v"
        ).write.mode("append").parquet(dest)
    before = sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(dest).collect()
    )
    side_before = persist.read_sidecar(dest)
    assert len(persist._artifact_data_files(dest)) > 32

    assert persist.compact_artifact(spark, dest, max_files=32, target_files=4)
    files = persist._artifact_data_files(dest)
    assert len(files) <= 4
    after = sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(dest).collect()
    )
    assert after == before
    assert persist.read_sidecar(dest) == side_before
    # under the threshold now -> no-op
    assert not persist.compact_artifact(spark, dest, max_files=32)
    # and the artifact still loads as fresh (identity untouched)
    meta = {k: side_before[k] for k in ("format", "name", "spec", "source_fp")}
    assert persist.load_artifact(spark, dest, meta) is not None


def test_compact_crash_window_leaves_rebuildable_not_servable(
    spark, tmp_path, monkeypatch
):
    """A crash INSIDE compaction's swap window (after the staged
    rewrite, mid file-delete) must never leave a valid sidecar over
    partial data: the sidecar is lifted out first, so the half-swapped
    directory reads as a half-written build (load_artifact -> None,
    gc reason no_sidecar) and the next persisted_artifact call
    REBUILDS instead of serving truncated rows."""
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    import os as _os

    from scribedb_spark import persist

    src = tmp_path / "s.txt"
    src.write_text("x")
    builds = []

    def builder():
        builds.append(1)
        return spark.range(50).selectExpr("id", "id * 7 as v")

    persist.persisted_artifact(spark, "crashy", "/d/sfK", [str(src)], builder)
    dest = persist.artifact_path("crashy", "/d/sfK")
    for i in range(40):
        spark.range(1000 + i, 1001 + i).selectExpr(
            "id", "id * 7 as v"
        ).write.mode("append").parquet(dest)
    expected = sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(dest).collect()
    )

    real_remove = _os.remove
    state = {"n": 0}

    def exploding_remove(path):
        state["n"] += 1
        if state["n"] >= 2:  # crash mid delete-loop: some files gone
            raise RuntimeError("simulated crash during compaction swap")
        return real_remove(path)

    monkeypatch.setattr(_os, "remove", exploding_remove)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        persist.compact_artifact(spark, dest, max_files=32, target_files=4)
    monkeypatch.setattr(_os, "remove", real_remove)

    # the window left NO sidecar: never servable, classified half-built
    assert persist.read_sidecar(dest) is None
    meta = {
        "format": persist.ARTIFACT_FORMAT,
        "name": "crashy",
        "spec": {},
        "source_fp": persist.source_fingerprint([str(src)]),
    }
    assert persist.load_artifact(spark, dest, meta) is None
    census = {
        r["artifact"]: r["reason"]
        for r in persist.gc_warehouse()
        if "crashy" in r["artifact"]
    }
    assert set(census.values()) == {"no_sidecar"}

    # and the normal serve path rebuilds from scratch, full rows back
    df = persist.persisted_artifact(
        spark, "crashy", "/d/sfK", [str(src)], builder
    )
    assert len(builds) == 2  # rebuilt, not served
    got = sorted((r["id"], r["v"]) for r in df.collect())
    assert got == sorted((i, i * 7) for i in range(50))
    assert expected  # (the pre-crash multiset existed; rebuild replaces it)


def test_gc_warehouse_classifies_and_deletes_stale(spark, tmp_path, monkeypatch):
    """GC census: fresh artifacts survive; missing-sidecar, old-format
    and fingerprint-drifted slots are classified with reasons and
    deleted only with delete=True."""
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    from scribedb_spark import persist

    srcs = {}
    for name in ("fresh", "no_sidecar", "old_format", "drifted"):
        s = tmp_path / f"{name}.txt"
        s.write_text("x")
        srcs[name] = s
        persist.persisted_artifact(
            spark, name, "/d/sfG", [str(s)], lambda: spark.range(3)
        )
    os.remove(
        os.path.join(
            persist.artifact_path("no_sidecar", "/d/sfG"), "_ARTIFACT_META.json"
        )
    )
    meta_f = os.path.join(
        persist.artifact_path("old_format", "/d/sfG"), "_ARTIFACT_META.json"
    )
    side = json.load(open(meta_f))
    side["format"] = persist.ARTIFACT_FORMAT - 1
    json.dump(side, open(meta_f, "w"))
    srcs["drifted"].write_text("mutated content, longer")

    census = {r["artifact"]: r for r in persist.gc_warehouse(delete=False)}
    assert census["sfG/fresh"]["stale"] is False
    assert census["sfG/no_sidecar"]["reason"] == "no_sidecar"
    assert census["sfG/old_format"]["reason"] == "format"
    assert census["sfG/drifted"]["reason"] == "stale_source"
    assert not any(r["deleted"] for r in census.values())
    assert all(
        os.path.isdir(persist.artifact_path(n, "/d/sfG")) for n in srcs
    )

    deleted = {
        r["artifact"]: r for r in persist.gc_warehouse(delete=True)
    }
    assert os.path.isdir(persist.artifact_path("fresh", "/d/sfG"))
    for name in ("no_sidecar", "old_format", "drifted"):
        assert deleted[f"sfG/{name}"]["deleted"] is True
        assert not os.path.isdir(persist.artifact_path(name, "/d/sfG"))


def test_compaction_advice_boundaries():
    """The advisor policy's integer thresholds: the file-count floor,
    the rows-derived ideal, and the stream-owned override."""
    from scribedb_spark.persist import (
        _ADVISOR_ROWS_PER_FILE,
        compaction_advice,
    )

    # at the 4-file floor: ok; one file over: compact
    assert compaction_advice(4, 100, False) == ("ok", 1)
    assert compaction_advice(5, 100, False) == ("compact", 1)
    # a big artifact raises ideal above the floor (ceil division)
    rows = 10 * _ADVISOR_ROWS_PER_FILE
    assert compaction_advice(10, rows, False) == ("ok", 10)
    assert compaction_advice(11, rows, False) == ("compact", 10)
    assert compaction_advice(11, rows + 1, False) == ("ok", 11)
    # stream ownership wins over any file count
    assert compaction_advice(50, 100, True) == ("stream_owned", 1)
    # empty artifact still floors at one ideal file
    assert compaction_advice(0, 0, False) == ("ok", 1)
