"""Round-trip tests for the non-parquet source formats (S1/S7
adjacents): schema-required CSV and JSON-lines readers must
reproduce the parquet-read dataset exactly."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    from scribedb_spark.sources import table

    return table(spark, "orders", sf_dir)


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


def test_csv_round_trip(spark, orders, tmp_path_factory):
    from scribedb_spark.sources import read_csv

    p = str(tmp_path_factory.mktemp("csv") / "orders")
    orders.write.mode("overwrite").option("header", "true").csv(p)
    back = read_csv(spark, p, orders.schema)
    assert back.schema == orders.schema
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_json_round_trip(spark, orders, tmp_path_factory):
    from scribedb_spark.sources import read_json

    p = str(tmp_path_factory.mktemp("json") / "orders")
    orders.write.mode("overwrite").json(p)
    back = read_json(spark, p, orders.schema)
    assert back.schema == orders.schema
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_orc_round_trip(spark, orders, tmp_path_factory):
    from scribedb_spark.sources import read_orc

    p = str(tmp_path_factory.mktemp("orc") / "orders")
    orders.write.mode("overwrite").orc(p)
    back = read_orc(spark, p)
    assert back.schema == orders.schema
    assert _sorted_rows(back) == _sorted_rows(orders)
    # ORC scans push predicates like parquet
    plan = back.filter("o_orderkey = 7")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]" in plan


def test_convert_to_parquet_partitioned(spark, orders, tmp_path_factory):
    from scribedb_spark.sources import convert_to_parquet

    p = str(tmp_path_factory.mktemp("pq") / "orders")
    convert_to_parquet(orders, p, partition_by=["o_orderstatus"])
    back = spark.read.parquet(p)
    assert back.count() == orders.count()
    # partition pruning: a status filter must prune to one directory
    plan = back.filter("o_orderstatus = 'F'")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_events_read_without_session_conf(spark, sf_dir):
    """Driver-env mirror: the correctness driver builds its own vanilla
    SparkSession (no nanosAsLong conf), under which round-1's events
    reads died with PARQUET_TYPE_ILLEGAL. table() must set the conf at
    read time, so an events read succeeds even when the session was
    built without it."""
    from pyspark.sql import types as T

    from scribedb_spark.sources import table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = table(spark, "events", sf_dir)
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        assert df.limit(5).count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_write_sharded_layout_and_determinism(spark, sf_dir, tmp_path_factory):
    """write_sharded: shard=K dirs, one file per shard, membership =
    md5-hash mod n, in-file rows hash-ordered; a second write from a
    differently-partitioned input produces identical shard membership."""
    import glob

    from scribedb_spark.sources import table, write_sharded

    docs = table(spark, "documents", sf_dir).select("doc_id", "source")
    base = tmp_path_factory.mktemp("shards")
    p1 = str(base / "run1")
    write_sharded(docs, p1, "doc_id", n_shards=4)
    dirs = sorted(glob.glob(f"{p1}/shard=*"))
    assert [d.rsplit("=", 1)[1] for d in dirs] == ["0", "1", "2", "3"]
    for d in dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1

    back = spark.read.parquet(p1)
    assert back.count() == docs.count()
    # membership matches the registry operator's assignment
    from pyspark.sql import functions as F

    expected = docs.withColumn(
        "shard",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            ).cast("long"),
            F.lit(4),
        ),
    )
    mismatch = (
        back.select("doc_id", "shard")
        .exceptAll(expected.select("doc_id", "shard"))
        .count()
    )
    assert mismatch == 0

    # determinism: same membership from a shuffled/differently-
    # partitioned input
    p2 = str(base / "run2")
    write_sharded(docs.repartition(13), p2, "doc_id", n_shards=4)
    a = spark.read.parquet(p1).select("doc_id", "shard")
    b = spark.read.parquet(p2).select("doc_id", "shard")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
