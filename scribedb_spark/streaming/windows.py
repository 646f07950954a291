"""Structured Streaming windowed aggregations (SURVEY.md §2.10).

The reference is batch-only; these are the engine's streaming
extensions. Batch-first design: the transformation functions take any
DataFrame — batch or streaming — and the t2-checked batch-equivalent
keys (`stream_tumbling_agg` etc. in queries.py) run the *same* logic,
which is exactly how Structured Streaming's incrementalization model
is meant to be used.

Scale: watermarks bound state; aggregation state lives in the state
store partitioned by group key — the standard shuffle-partitioned
stateful operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str | None = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window count/sum per event_type. For a streaming input
    the watermark bounds late data and state retention."""
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming and watermark
        else events
    )
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "cnt", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming and watermark
        else events
    )
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "cnt")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming and watermark
        else events
    )
    return (
        src.groupBy("user_id", F.session_window(ts_col, gap).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("win.start").alias("session_start"), "n_events")
    )


def read_events_stream(
    spark: SparkSession, parquet_dir: str, schema=None
) -> DataFrame:
    """File-source stream over a parquet directory (one-file-per-batch
    for tests; in production this is the Kafka/file-drop source)."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("maxFilesPerTrigger", 1).parquet(parquet_dir)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain a stream into an in-memory table (availableNow trigger)
    and return the query handle. Caller awaits termination and reads
    ``spark.table(name)``."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str | None = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once dedup over an event stream: cross-batch duplicate
    keys are dropped; the watermark bounds dedup state (keys older
    than it are evicted — without one, state grows with every key
    ever seen, which no 100 TB stream survives).

    Batch twin (same call on a batch DataFrame): plain
    ``dropDuplicates(keys)``. Note Spark only guarantees state
    CLEANUP at the watermark; rows arriving later than it may still
    pass through (documented "may or may not be dropped").
    """
    if events.isStreaming and watermark:
        return events.withWatermark(ts_col, watermark).dropDuplicates(
            [*keys, ts_col]
        )
    return events.dropDuplicates([*keys, ts_col])
