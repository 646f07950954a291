"""Salted-join equivalence tests: salting must not change the result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scribedb_spark.operators.skew import hot_keys, salted_join


@pytest.fixture(scope="module")
def skewed_events(spark, sf_dir):
    """events with user_id collapsed so one key dominates (~40%)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return e.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 < 2, F.lit(7)).otherwise(F.col("user_id")),
    ).select("event_id", "user_id", "value")


@pytest.fixture(scope="module")
def user_dim(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.select("user_id").distinct().withColumn("segment", F.col("user_id") % 3)
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_equivalent(skewed_events, user_dim):
    plain = skewed_events.join(user_dim, "user_id", "inner").select(
        "user_id", "event_id", "value", "segment"
    )
    salted = salted_join(skewed_events, user_dim, "user_id", "inner").select(
        "user_id", "event_id", "value", "segment"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_left_join_equivalent(skewed_events, user_dim):
    dim_partial = user_dim.filter(F.col("user_id") % 2 == 0)
    plain = skewed_events.join(dim_partial, "user_id", "left").select(
        "user_id", "event_id", "segment"
    )
    salted = salted_join(skewed_events, dim_partial, "user_id", "left").select(
        "user_id", "event_id", "segment"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_hot_keys_finds_planted_skew(skewed_events):
    hot = {r["user_id"] for r in hot_keys(skewed_events, "user_id", 100).collect()}
    assert 7 in hot
    assert len(hot) < 10  # only the genuinely hot tail


def test_salted_join_rejects_unsupported_how(skewed_events, user_dim):
    with pytest.raises(ValueError):
        salted_join(skewed_events, user_dim, "user_id", "full_outer")
