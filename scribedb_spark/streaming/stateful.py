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
