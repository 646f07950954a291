"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10: "applyInPandasWithState for custom stateful
operators").

``running_user_stats``: per-user running count / sum / max over an
event stream — state is one tiny tuple per user, updated per
micro-batch, emitted on every update. This is the canonical shape for
operators Structured Streaming's built-in aggregations can't express
(custom eviction, model state, session payloads).

Scale: state lives in the state store, partitioned by the grouping
key — the same shuffle partitioning as any keyed aggregation; each
micro-batch touches only the groups present in the batch. The pandas
batches arrive Arrow-encoded (vectorized, not per-row pickling).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, max_value double"
STATE_SCHEMA = "n long, s double, m double"


def _update_user_stats(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        m = max(m, float(pdf["value"].max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [s], "max_value": [m]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming: per-user running stats with explicit state.
    Works only on streaming DataFrames (use ``batch_user_stats`` as
    the batch twin for verification)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_user_stats(events: DataFrame) -> DataFrame:
    """Batch twin of running_user_stats' *final* state."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
    )


def _register_key():
    from pyspark.sql import functions as F

    from scribedb_spark.queries import register
    from scribedb_spark.sources import table

    @register(
        "stream_stateful_stats",
        oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_cents,
               MAX(value) AS max_value
        FROM events GROUP BY user_id
        """,
    )
    def stream_stateful_stats(spark, sf_dir) -> DataFrame:
        """Driver-provable surface of the applyInPandasWithState
        operator: the FINAL state of ``running_user_stats`` per user
        (count / sum / max), expressed as the batch twin the
        streaming equality test converges to
        (tests/test_streaming.py::test_stateful_running_stats_converges_to_batch).
        Money sums go through floor-rounded integer cents (the float
        sum the stateful kernel carries is order-dependent and not
        hash-portable); max is order-free and stays a raw double.

        Scale: one hash aggregation keyed like the state store
        (map-side partials); the streaming form touches only the
        groups present in each micro-batch."""
        e = table(spark, "events", sf_dir)
        return e.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("sum_cents"),
            F.max("value").alias("max_value"),
        )


_register_key()
