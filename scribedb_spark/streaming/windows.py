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
