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

from typing import Any, Callable


def session_cache(
    cache: dict, spark, key_tail: tuple, builder: Callable[[], Any]
) -> Any:
    """Return ``cache[(appId, *key_tail)]``, building it on first use.

    Evicts every entry belonging to a different applicationId before
    the lookup, so at most one session's artifacts are ever held and
    nothing from a stopped SparkContext is pinned.
    """
    app = spark.sparkContext.applicationId
    for stale in [k for k in cache if k[0] != app]:
        cache.pop(stale, None)
    key = (app,) + tuple(key_tail)
    if key not in cache:
        cache[key] = builder()
    return cache[key]
