"""Structured Streaming tests: windowed aggs + incremental diff via
foreachBatch, each validated against its batch twin (batch-first
design, SURVEY.md §2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scribedb_spark.sources import table
from scribedb_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from scribedb_spark.streaming.diff import stream_compare


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return table(spark, "events", sf_dir)


@pytest.fixture(scope="module")
def events_stream_dir(spark, events_batch, tmp_path_factory):
    """Re-write events as several parquet files so the file stream has
    multiple micro-batches."""
    d = tmp_path_factory.mktemp("events_stream")
    events_batch.repartition(4).write.mode("overwrite").parquet(str(d))
    return str(d)


def _drain(spark, stream_df, name, mode="complete"):
    q = run_to_memory(stream_df, name, output_mode=mode)
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, events_batch, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir, schema=events_batch.schema)
    got = _drain(spark, tumbling_counts(stream), "t_tumbling")
    want = tumbling_counts(events_batch)
    cols = ["win_start", "event_type", "cnt", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_stream_equals_batch(spark, events_batch, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir, schema=events_batch.schema)
    got = _drain(spark, sliding_counts(stream), "t_sliding")
    want = sliding_counts(events_batch)
    cols = ["win_start", "cnt"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_stream_equals_batch(spark, events_batch, events_stream_dir):
    """No watermark here: the replayed files are not time-ordered, so
    a watermark would (correctly) drop 'late' events; complete-mode
    session state doesn't need one."""
    stream = read_events_stream(spark, events_stream_dir, schema=events_batch.schema)
    got = _drain(spark, session_counts(stream, watermark=None), "t_session")
    want = session_counts(events_batch)
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_compare_detects_mutation(spark, events_batch, events_stream_dir):
    """Incremental diff: stream the events table against a reference
    with one mutated row -> exactly that row is flagged across all
    micro-batches (the reference's chunk loop, incrementalized)."""
    reference = events_batch.withColumn(
        "value",
        F.when(F.col("event_id") == 42, F.col("value") + 999).otherwise(
            F.col("value")
        ),
    )
    stream = read_events_stream(spark, events_stream_dir, schema=events_batch.schema)
    q, acc = stream_compare(stream, reference, keys=["event_id"])
    q.awaitTermination(120)
    assert len(acc.batches) >= 2  # several micro-batches ran
    assert acc.total_diff == 2  # the mutated row, from each side
    assert sum(0 if b["equal"] else 1 for b in acc.batches) == 1
