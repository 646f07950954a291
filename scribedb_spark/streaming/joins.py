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


@register(
    "stream_enrich_static",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_nationkey
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def stream_enrich_static(spark, sf_dir) -> DataFrame:
    """Batch twin of the stream-static enrichment join (the same
    ``stream_static_enrich`` body the streaming test drains against a
    live readStream): each event row picks up its customer dimension
    attributes. The DuckDB oracle hash-checks the join semantics; the
    streaming-equality test (tests/test_streaming.py::
    test_stream_static_enrich_equals_batch) checks the
    incrementalization — stream-static joins are stateless, so each
    micro-batch re-plans the join and Catalyst broadcasts the dim
    exactly as in batch (no watermark, no state store).

    Scale: the dim side is re-resolved per micro-batch, which is the
    mechanism by which slowly-changing dims propagate between
    batches; a corpus-sized dim would flip to a shuffle join under
    AQE — no forced hint here for exactly that reason."""
    e = table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    dim = table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey"
    )
    return stream_static_enrich(e, dim, "user_id").select(
        "event_id", "user_id", "event_type", "c_name", "c_nationkey"
    )


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


@register(
    "stream_watermark_late",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us
      FROM events),
    w AS (
      SELECT event_type,
             CASE WHEN us < MAX(us) OVER (
                    PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  - 600000000
                  THEN 1 ELSE 0 END AS is_late
      FROM e)
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(is_late) AS BIGINT) AS n_late
    FROM w GROUP BY event_type
    """,
)
def stream_watermark_late(spark, sf_dir) -> DataFrame:
    """Late-data accounting under a 10-minute watermark — the batch
    twin of Structured Streaming's ``withWatermark`` drop policy:
    per key (user_id), events arrive in event_id order, the
    watermark is the running max event time seen so far minus the
    10-minute allowance, and an event is LATE (would be dropped from
    a watermarked stateful aggregation) iff its event time is below
    the watermark established by the events that arrived before it.
    The first arrival per key is never late (empty frame -> NULL
    watermark). Output: per-event-type totals and late counts — the
    monitoring table that tells you whether an allowance is sized
    right before you deploy it.

    Scale: one shuffle keyed by user_id (per-key frames, no global
    order — a single global watermark window would serialize; real
    Structured Streaming also tracks the watermark per partition and
    takes the min), then a partial-agg rollup of two integers per
    event_type. Time arithmetic is integer microseconds
    (``unix_micros``/``epoch_us``) — no interval types, identical
    across engines."""
    e = table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_late = F.coalesce(
        F.col("us") < F.max("us").over(w) - F.lit(600_000_000),
        F.lit(False),
    ).cast("int")
    return (
        e.select("event_type", is_late.alias("is_late"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_late").alias("n_late"),
        )
    )
