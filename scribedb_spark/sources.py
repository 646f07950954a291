"""Sources & sinks (SURVEY.md §2.1).

The reference reads exactly two source kinds — PostgreSQL and Oracle
via SQLAlchemy query-defined views (reference scribedb/postgres.py:45-63,
scribedb/oracle.py:103-137). Spark-first, a "source" is anything
``spark.read`` supports; this module provides the engine's named
loaders plus JDBC parity helpers (S1/S2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """S7: parquet scan of one driver table. Plain ``spark.read.parquet``
    so Catalyst gets predicate pushdown / column pruning / partition
    pruning for free (SURVEY.md §4).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark only reads
    as a raw long (nanosAsLong); convert to a proper timestamp here
    (floor to microseconds — identical to DuckDB's read of the same
    file). The conf is set at read time, not only at session build
    (session.py), because callers — like the correctness driver — may
    hand us a vanilla session; it is runtime-settable."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir or DEFAULT_SF_DIR}/{name}.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer div, NOT `/`: long/1000 promotes to double and the
        # ~1.7e18 ns values lose ulp precision -> off-by-1-microsecond
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # timestamp[us] isAdjustedToUTC=false parquet reads as NTZ;
        # normalize to TIMESTAMP (LTZ) so downstream code (unix_micros,
        # F.window, watermarks) sees one type. Sessions run UTC, so the
        # wall-clock values are unchanged and DuckDB (which reads the
        # same file as a naive timestamp) renders identical text.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {n: table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """S3 equivalent: name every dataset as a temp view so both the
    DataFrame API and ``spark.sql`` address the same tables (the
    reference materializes server-side views for the same purpose,
    reference scribedb/postgres.py:79-89)."""
    for n, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(n)


def read_jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    *,
    driver: str | None = None,
    user: str | None = None,
    password_env: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S1/S2: query-defined JDBC source.

    Mirrors the reference's config surface — connection URL + SQL query
    + password taken from an env var named in the config (reference
    scribedb/base.py:35-39, scribedb/postgres.py:45-63) — but adds the
    thing the reference cannot do: *partitioned* parallel reads
    (``partitionColumn``/bounds), so a 1000-executor cluster doesn't
    funnel the whole table through one connection. Filters and column
    pruning still push down to the database (Spark JDBC DSv2).
    """
    r = spark.read.format("jdbc").option("url", url).option("query", query)
    if driver:
        r = r.option("driver", driver)
    if user:
        r = r.option("user", user)
    if password_env:
        r = r.option("password", os.environ.get(password_env, ""))
    if partition_column:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return r.load()


def write_report(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """S6: result sink — the reference prints rich-console lines
    (reference main.py:229-247); the engine writes a structured
    report dataset."""
    df.write.mode("overwrite").format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by join keys.

    Bucketing is the 100 TB co-location lever: two tables bucketed by
    the same keys into the same bucket count join WITHOUT a shuffle
    (verified by tests/test_plans.py::test_bucketed_join_no_shuffle).
    Re-used across every downstream join on those keys — the shuffle
    is paid once at write time instead of per query.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with a REQUIRED schema.

    ``inferSchema`` is deliberately not offered: inference is a full
    extra pass over the data before the real job — at 100 TB that
    doubles the scan. Column pruning still works (Spark's CSV reader
    parses only requested columns); predicate pushdown does not, so
    prefer converting hot CSV datasets to parquet via
    ``convert_to_parquet``.
    """
    return spark.read.schema(schema).options(header=str(header).lower(), **options).csv(path)


def read_json(spark: SparkSession, path: str, schema, **options: str) -> DataFrame:
    """JSON-lines scan with a REQUIRED schema (same no-inference rule
    as read_csv; schema-on-read also silently nulls malformed fields
    instead of failing mid-job — pair with a count on
    ``_corrupt_record`` if strictness matters)."""
    return spark.read.schema(schema).options(**options).json(path)


def write_sharded(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int = 8,
    sort_within: list[str] | None = None,
) -> None:
    """Write a dataset as deterministic hash shards: one directory per
    shard (``shard=K/``), exactly one file per shard, rows ordered by
    the shard hash (collision-broken by the key) — the training-shard
    layout `text_shard_assign` computes, materialized. Because the
    shard and order are pure functions of the key, re-runs and other
    engines reproduce byte-identical shard membership.

    Scale: one shuffle (repartition on the shard id); each shard is
    one writer task, so pick ``n_shards`` to bound file sizes
    (corpus_bytes / n_shards ~ a few hundred MB per file).
    """
    from pyspark.sql import functions as F

    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10
    ).cast("long")
    sharded = df.withColumn("__h", h).withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(n_shards))
    )
    order = ["__h", key] if sort_within is None else sort_within
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", *order)
        .drop("__h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC scan. Unlike CSV/JSON, ORC is self-describing and columnar:
    no schema argument needed, and predicate pushdown + column pruning
    work like parquet (min/max stripe statistics), so ORC datasets are
    first-class citizens alongside parquet rather than
    convert-then-query sources."""
    return spark.read.options(**options).orc(path)


def convert_to_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """One-time conversion of a row-format source (CSV/JSON/JDBC) to
    parquet, optionally hive-partitioned — the standard first step
    that buys pushdown, pruning, and column statistics for every
    later query."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
