"""Per-Spark-session cache for built index artifacts.

Several keys model a "build once, serve many" lifecycle whose build
step is expensive relative to the serve step: merkle trees
(queries.fp_merkle / compare_merkle_drill), the keyed cell-fingerprint
grid (analytics.compare_cell_incremental), trained ANN quantizers
(operators/similarity.py) and the containment token stages
(operators/dedup.py). At 100 TB each of those artifacts is a persisted
table or a served index; in-session the honest analog is building it
exactly once per SparkSession and reusing it across invocations.

``session_cache`` is the one shared discipline: entries are keyed by
``(applicationId, *key_tail)`` and every lookup first EVICTS entries
whose applicationId differs from the live session's — a stopped
session's localCheckpoint'd DataFrames reference a dead SparkContext
and must not outlive it (long-lived pytest runners and multi-session
drivers would otherwise pin them forever).
"""

from __future__ import annotations

import os
from typing import Any, Callable


def session_cache(
    cache: dict,
    spark,
    key_tail: tuple,
    builder: Callable[[], Any],
    deps: list[str] | None = None,
) -> Any:
    """Return ``cache[(appId, *key_tail)]``, building it on first use.

    Evicts every entry belonging to a different applicationId before
    the lookup, so at most one session's artifacts are ever held and
    nothing from a stopped SparkContext is pinned.

    ``deps`` (optional) lists the SOURCE FILES the built artifact is a
    pure function of (e.g. the corpus parquet a signature table reads).
    When given, their stat fingerprint is folded into the cache key and
    same-name entries with a DIFFERENT fingerprint are evicted — so an
    in-session rewrite of the source invalidates the artifact instead
    of silently serving pre-mutation state (the honesty property
    ``gate_decision`` documents must hold TRANSITIVELY through the
    session caches a gate's measurement body reads). Cost per lookup:
    one os.stat per dep file.
    """
    app = spark.sparkContext.applicationId
    for stale in [k for k in cache if k[0] != app]:
        cache.pop(stale, None)
    key = (app,) + tuple(key_tail)
    if deps is not None:
        fp = deps_fingerprint(deps)
        for old in [
            k for k in cache if k[:-1] == key and k[-1] != fp
        ]:
            cache.pop(old, None)
        key = key + (fp,)
    if key not in cache:
        cache[key] = builder()
    return cache[key]


# ---------------------------------------------------------------------------
# Gate-decision cache: the monitor -> act gates' one-pane serve layer
# ---------------------------------------------------------------------------

#: (appId, gate_key, sf_dir, deps_fingerprint) -> the gate's tiny
#: decision frame, MATERIALIZED as a local DataFrame
#: (spark.createDataFrame(rows, schema), held per applicationId) —
#: populated the first time a gate runs, read by every later call
#: (the gate key itself, rollup_gate_panel, streaming panes) within
#: the same session
_DECISION_ROWS: dict = {}


def deps_fingerprint(paths: list[str]) -> tuple:
    """Stat-only fingerprint of a gate's input files: per path, the
    persist.source_fingerprint of its tree, or 'absent' when the path
    does not exist (an absent->built warehouse slot must invalidate).
    Cheap (os.stat only) — this is what makes serving a cached
    decision HONEST: any mutation of the measured inputs changes the
    fingerprint and forces a fresh measurement."""
    from scribedb_spark.persist import source_fingerprint

    return tuple(
        (p, source_fingerprint([p]) if os.path.exists(p) else "absent")
        for p in paths
    )


def gate_decision(
    spark,
    gate_key: str,
    sf_dir: str,
    deps: list[str],
    compute: Callable[[], Any],
):
    """Serve a monitor gate's decision frame from the session cache.

    The monitor -> act gates (ANN/MIPS retrain, dedup retune, LM /
    quality drift, freshness, gaps, budget, compaction) each produce a
    <=#streams-row decision table whose measurement step is the
    expensive half. Within one session the decision is a pure function
    of the gate's input files (corpus parquet + warehouse artifact
    dirs), so it is computed ONCE per distinct input fingerprint and
    every later call — in particular rollup_gate_panel, which reads
    all nine — serves the collected rows back as a local frame. The
    retrain gates' act paths stay correct: an act rewrites warehouse
    artifacts, which changes the fingerprint, so the NEXT call
    re-measures the rebuilt index instead of serving the stale
    verdict (pinned by the degraded-index tests in
    tests/test_similarity.py). Plan-shape tests pin the underlying
    measurement plans via pipeline.GATE_COMPUTE, not this serve layer.
    """
    fp = deps_fingerprint(deps)

    def build():
        df = compute()
        # materialize AND keep the local frame: rebuilding a
        # createDataFrame per read costs ~0.3 s of session RPC, so
        # the cached value is the ready-to-collect local relation
        return spark.createDataFrame(df.collect(), df.schema)

    return session_cache(
        _DECISION_ROWS, spark, (gate_key, sf_dir, fp), build
    )


def clear_gate_decisions() -> None:
    """Drop every cached gate decision (tests that mutate gate inputs
    behind identical stat fingerprints — e.g. same-mtime rewrites —
    use this to force re-measurement)."""
    _DECISION_ROWS.clear()
