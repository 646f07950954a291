"""Hypertable-style tiered time rollups (timeseries continuous-
aggregate pattern).

The idea: aggregate a 100 TB event stream ONCE at the finest grain
(minute), then derive every coarser grain (hour, day, month, ...)
by re-aggregating the partials — never rescanning the raw table.
This only works for aggregates whose partial states merge
associatively (count, sum, min, max, and sketches like HLL);
averages/ratios are computed at the END from the merged sums.

Scale design: the minute tier reduces the raw table by orders of
magnitude (events-per-minute-per-key -> 1 row), so the hour and day
tiers shuffle tiny inputs. On a real deployment each tier is written
partitioned by its bucket (convert_to_parquet(partition_by=[...]))
and refreshed incrementally: only buckets whose watermark advanced
are recomputed — the batch twin of a Structured Streaming windowed
aggregation with append output (streaming/windows.py).

The registered key proves the tier chain is EXACT: the day tier
built minute->hour->day hash-matches a direct day aggregation of the
raw table (the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scribedb_spark.queries import register
from scribedb_spark.sources import table

#: merge rules for re-aggregable partial columns: output name ->
#: (leaf aggregate over the raw column, merge aggregate over partials)
_MERGEABLE = {
    "n_events": (lambda c: F.count(F.lit(1)), F.sum),
    "sum_value": (lambda c: F.sum(c.cast("decimal(18,2)")), F.sum),
    "min_value": (lambda c: F.min(c), F.min),
    "max_value": (lambda c: F.max(c), F.max),
}


def merge_tier(tier_df: DataFrame, tier: str, keys: list[str]) -> DataFrame:
    """Re-aggregate a tier frame [bucket, *keys, partials...] to a
    coarser grain by merging the partial columns (sum-of-sums,
    min-of-mins, ...). Works on any frame with _MERGEABLE columns —
    including one produced by the STREAMING leaf tier."""
    merge = [
        merge_fn(F.col(name)).alias(name)
        for name, (_, merge_fn) in _MERGEABLE.items()
    ]
    return (
        tier_df.groupBy(F.date_trunc(tier, F.col("bucket")).alias("bucket"), *keys)
        .agg(*merge)
    )


def tiered_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    tiers: list[str] = ("minute", "hour", "day"),
) -> dict[str, DataFrame]:
    """Build the tier chain: finest tier from the raw rows, every
    coarser tier from the previous tier's partials. Returns
    {tier_name: DataFrame} with columns [bucket, *keys, n_events,
    sum_value (decimal), min_value, max_value]."""
    out: dict[str, DataFrame] = {}
    v = F.col(value_col)
    leaf = [leaf_fn(v).alias(name) for name, (leaf_fn, _) in _MERGEABLE.items()]
    cur = (
        df.groupBy(F.date_trunc(tiers[0], F.col(ts_col)).alias("bucket"), *keys)
        .agg(*leaf)
    )
    out[tiers[0]] = cur
    for tier in tiers[1:]:
        cur = merge_tier(cur, tier, keys)
        out[tier] = cur
    return out


def stream_minute_tier(
    events: DataFrame,
    keys: list[str] = ("event_type",),
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """The STREAMING leaf of the continuous aggregate: a watermarked
    1-minute windowed aggregation maintaining the same partial columns
    as the batch minute tier — so `merge_tier` rolls its output up to
    hour/day unchanged. This is the production split: one streaming
    job maintains the finest tier incrementally; cheap periodic batch
    jobs re-aggregate it upward (they scan the tiny tier table, never
    the raw stream's history)."""
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming and watermark
        else events
    )
    v = F.col(value_col)
    leaf = [leaf_fn(v).alias(name) for name, (leaf_fn, _) in _MERGEABLE.items()]
    return (
        src.groupBy(F.window(ts_col, "1 minute").alias("win"), *keys)
        .agg(*leaf)
        .select(F.col("win.start").alias("bucket"), *keys, *_MERGEABLE)
    )


@register(
    "rollup_hypertable",
    oracle="""
    SELECT date_trunc('day', ts) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def rollup_hypertable(spark, sf_dir) -> DataFrame:
    """Day-level continuous aggregate computed through the FULL tier
    chain (minute -> hour -> day re-aggregation), hash-checked against
    a direct day-grain aggregation of the raw table — proving the
    partial-merge rules are exact (decimal sums merge associatively;
    avg derived from merged sum/count at the end, never averaged
    across tiers)."""
    e = table(spark, "events", sf_dir)
    day = tiered_rollup(e, "ts", "value", ["event_type"])["day"]
    return day.select(
        "bucket",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
        (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
    )


@register(
    "rollup_gapfill",
    oracle="""
    WITH agg AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_v
      FROM events GROUP BY 1, 2),
    b AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM b),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT s.bucket, t.event_type,
           COALESCE(a.n, 0) AS n_events,
           last_value(a.avg_v IGNORE NULLS) OVER (
             PARTITION BY t.event_type ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_avg_value
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN agg a ON a.bucket = s.bucket AND a.event_type = t.event_type
    """,
)
def rollup_gapfill(spark, sf_dir) -> DataFrame:
    """Timeseries gap-fill with last-observation-carried-forward
    (the timescale-style `time_bucket_gapfill` + `locf` pattern): a
    dense hourly grid per event_type, empty buckets emitted with
    n_events = 0 and the last seen hourly average carried forward
    (NULL before the first observation — both engines agree).

    Exactness: the carried value is the exact-decimal-sum average
    (sum DECIMAL(18,2) -> double / count), computed once per
    observed bucket and COPIED into gaps — LOCF adds no arithmetic,
    so no rounding tolerance is needed.

    Scale: the raw table collapses in the FIRST aggregation
    (map-side partials, one row per (bucket, key)); everything after
    operates on grid-sized data. The spine is generated from a
    1-row min/max aggregate via sequence+explode — its size is
    time-range-bounded (hours-per-decade ~= 88k), independent of row
    count, and the LOCF window partitions by key with
    time-range-bounded partitions. A deployment with years of data
    and millions of keys would range-partition the grid by (key,
    month) and seed each range's LOCF with the previous range's
    closing value — the same mergeable-partial trick as the tier
    chain above."""
    e = table(spark, "events", sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_v"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    types = e.select("event_type").distinct()
    grid = spine.crossJoin(types)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["bucket", "event_type"], "left")
        .select(
            "bucket",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.last("avg_v", ignorenulls=True).over(w).alias("locf_avg_value"),
        )
    )
