"""Remote-hash SQL generation tests.

The DuckDB bundle is executed for real against DuckDB (which we have),
and its chunk hash must equal the engine's reference-compat chain
computed by canonical.fp_chain on the same rows — proving a remotely
computed hash and a Spark-computed hash agree, which is the whole
point of remote-hash mode."""

from __future__ import annotations

import duckdb

from scribedb_spark.compat import duckdb_remote_hash, postgres_remote_hash


def test_postgres_bundle_structure():
    b = postgres_remote_hash("select a, b from t order by a", "v1", limit=100, offset=50)
    assert any("create or replace aggregate" in s for s in b.install)
    assert any("upper(md5(" in s for s in b.install)
    assert b.create_view.endswith("limit 100 offset 50")
    assert "order by" in b.hash_query
    assert len(b.drop) == 3


def test_duckdb_bundle_executes_and_matches_engine_chain(spark, sf_dir):
    """Run the generated DuckDB statements; compare against
    fp_chain over the same data (single chunk, same ordering)."""
    from pyspark.sql import functions as F

    from scribedb_spark.canonical import fp_chain

    con = duckdb.connect()
    con.execute(
        f"create view nation as select * from read_parquet('{sf_dir}/nation.parquet')"
    )
    # remote side: canonical '(key,name)' text per row, ordered by key
    b = duckdb_remote_hash(
        "select '(' || concat_ws(',', cast(n_nationkey as varchar), n_name) || ')' "
        "as v from nation order by n_nationkey",
        "sdbs_v1",
    )
    for s in b.install:
        con.execute(s)
    con.execute(b.create_view)
    remote_hash = con.execute(b.hash_query).fetchone()[0]
    for s in b.drop:
        con.execute(s)

    # engine side: same canonical text, one chunk
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    local = fp_chain(n, ["n_nationkey"], bucket_rows=10_000).collect()
    assert len(local) == 1
    assert local[0]["fp"] == remote_hash
