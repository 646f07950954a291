"""Streaming joins (SURVEY.md §2.10 extensions).

Two join shapes every event pipeline needs, each written batch-first
(the same function body serves the batch twin, which the tests check
for exact equality):

- stream-static enrichment: each micro-batch joins against a static
  dimension snapshot. No state, no watermark — the dim is re-resolved
  per batch (so slowly-changing dims pick up updates between
  batches). At scale the dim side broadcasts exactly like in batch.

- stream-stream time-bounded join: both sides keep watermark-bounded
  state; the time-range predicate is what lets Spark evict buffered
  rows (without it, both sides' state grows forever). The canonical
  use is attribution: match a `click` to the `view` that preceded it
  within an attribution window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scribedb_spark.queries import register
from scribedb_spark.sources import table


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Enrich an event stream with a static dimension. Stream-static
    joins are stateless: each micro-batch plans a fresh join, so
    Catalyst broadcasts the dim side when small — identical to the
    batch plan."""
    return events.join(dim, on, how)


def view_click_attribution(
    views: DataFrame,
    clicks: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "10 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each click matches the views by the
    same user in the preceding `within` interval.

    State bounds (the 100 TB knob): the watermark on BOTH inputs plus
    the two-sided time-range predicate let Spark discard buffered
    views older than (watermark + within) and clicks older than the
    watermark; without either, one side buffers the whole stream.
    On a batch input the same body is a plain self-join twin.
    """
    v = views.select(
        F.col(user_col).alias("v_user"),
        F.col(ts_col).alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.select(
        F.col(user_col).alias("c_user"),
        F.col(ts_col).alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    if views.isStreaming and watermark:
        v = v.withWatermark("v_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {within}")),
    ).select("v_user", "view_id", "click_id", "v_ts", "c_ts")


@register(
    "stream_click_attribution",
    oracle="""
    SELECT v.user_id AS v_user, v.event_id AS view_id,
           c.event_id AS click_id, v.ts AS v_ts, c.ts AS c_ts
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '10 minutes'
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def stream_click_attribution(spark, sf_dir) -> DataFrame:
    """Batch twin of the stream-stream attribution join (the same
    view_click_attribution body the streaming test drains) — the
    DuckDB oracle hash-checks the join semantics; the streaming
    equality test (tests/test_streaming.py) checks the
    incrementalization."""
    e = table(spark, "events", sf_dir)
    return view_click_attribution(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "click"),
    )
