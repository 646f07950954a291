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


def test_oracle_bundle_structure():
    from scribedb_spark.compat import oracle_remote_hash

    b = oracle_remote_hash(
        "select o_orderkey, o_comment from orders order by o_orderkey",
        "v1",
        ["o_orderkey", "o_comment"],
        limit=1000,
        offset=500,
    )
    joined = "\n".join(b.install).lower()
    # the four ODCI members + serial-chain recurrence + NLS pin
    for m in (
        "odciaggregateinitialize",
        "odciaggregateiterate",
        "odciaggregateterminate",
        "odciaggregatemerge",
        "dbms_crypto.hash",
        "rawtohex",
        "nls_timestamp_format",
    ):
        assert m in joined, m
    # reference's whitespace-quoting rule inside the aggregate
    assert r"regexp_replace(val, '(\w*\s[^,)]*)'" in "\n".join(b.install)
    assert b.create_view.endswith("offset 500 rows fetch next 1000 rows only")
    assert b.hash_query.startswith("select sdbs_md5('('||o_orderkey||','||")
    assert len(b.drop) == 3


def test_run_remote_hash_executes_and_drops(sf_dir):
    """The executor runs a full install->view->hash->drop cycle over a
    live DBAPI connection (DuckDB) and the hash survives while the
    installed objects do not."""
    from scribedb_spark.compat import duckdb_remote_hash, run_remote_hash

    con = duckdb.connect()
    con.execute(
        f"create view nation as select * from read_parquet('{sf_dir}/nation.parquet')"
    )
    b = duckdb_remote_hash(
        "select '(' || concat_ws(',', cast(n_nationkey as varchar), n_name) || ')' "
        "as v from nation order by n_nationkey",
        "sdbs_exec_v",
    )
    h = run_remote_hash(con, b)
    assert len(h) == 32 and h == h.upper()
    # view dropped: querying it again must fail
    import pytest as _pytest

    with _pytest.raises(Exception):
        con.execute("select * from sdbs_exec_v").fetchall()


def test_chunked_remote_hashes_match_fp_chain(spark, sf_dir):
    """End-to-end remote-hash chunk mode: chunked_bundles over DuckDB
    must reproduce canonical.fp_chain's per-chunk hashes 1:1 — a
    remote database and the Spark engine agree chunk by chunk with
    only 32 hex chars per chunk crossing the 'wire'."""
    from scribedb_spark.canonical import fp_chain
    from scribedb_spark.compat import chunked_bundles, run_remote_hash_chunks

    con = duckdb.connect()
    con.execute(
        f"create view nation as select * from read_parquet('{sf_dir}/nation.parquet')"
    )
    n_rows = con.execute("select count(*) from nation").fetchone()[0]
    bundles = chunked_bundles(
        "duckdb",
        "select '(' || concat_ws(',', cast(n_nationkey as varchar), n_name) || ')' "
        "as v from nation order by n_nationkey",
        "sdbs_ck",
        n_rows,
        10,
    )
    remote = run_remote_hash_chunks(con, bundles)

    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey", "n_name")
    local = {
        r["chunk_id"]: r["fp"]
        for r in fp_chain(n, ["n_nationkey"], bucket_rows=10).collect()
    }
    assert len(remote) == len(local) >= 2
    for i, h in enumerate(remote):
        assert h == local[i], f"chunk {i}"


def test_incremental_remote_hash_reuses_clean_chunks(sf_dir):
    """r14 VERDICT item 8: under a one-chunk mutation, the incremental
    runner must re-execute ONLY the touched chunk's bundle (counted at
    the DBAPI cursor), re-use every clean chunk's prior hash verbatim,
    and still agree hash-for-hash with a full from-scratch re-run."""
    from scribedb_spark.compat import (
        chunked_bundles,
        run_remote_hash_chunks,
        run_remote_hash_chunks_incremental,
    )

    con = duckdb.connect()
    con.execute(
        "create table nat as select * from "
        f"read_parquet('{sf_dir}/nation.parquet')"
    )
    q = (
        "select '(' || concat_ws(',', cast(n_nationkey as varchar), n_name)"
        " || ')' as v from nat order by n_nationkey"
    )
    n_rows = con.execute("select count(*) from nat").fetchone()[0]
    bundles = chunked_bundles("duckdb", q, "sdbs_inc", n_rows, 10)
    assert len(bundles) >= 3
    before = run_remote_hash_chunks(con, bundles)

    # mutate one row in chunk 1 (offsets 10..19 of the key order) —
    # equal row count, so every other chunk window is untouched
    key = con.execute(
        "select n_nationkey from nat order by n_nationkey"
        " limit 1 offset 12"
    ).fetchone()[0]
    con.execute(
        f"update nat set n_name = n_name || '_x' where n_nationkey = {key}"
    )

    class _CountingConn:
        def __init__(self, inner):
            self._inner = inner
            self.hash_queries = 0

        def cursor(self):
            outer = self

            class _Cur:
                def __init__(self, cur):
                    self._cur = cur

                def execute(self, sql, *a, **k):
                    if "list_reduce" in sql:
                        outer.hash_queries += 1
                    return self._cur.execute(sql, *a, **k)

                def fetchone(self):
                    return self._cur.fetchone()

            return _Cur(outer._inner.cursor())

    counting = _CountingConn(con)
    got = run_remote_hash_chunks_incremental(
        counting, bundles, prev=before, dirty={1}
    )
    assert counting.hash_queries == 1  # only the touched chunk re-hashed
    full = run_remote_hash_chunks(con, bundles)
    assert got == full
    assert got[1] != before[1]  # the mutation is visible
    for i, h in enumerate(before):
        if i != 1:
            assert got[i] == h  # clean chunks re-used verbatim
    # degraded modes: no prior state -> full run
    assert run_remote_hash_chunks_incremental(con, bundles, None, {1}) == full
    assert (
        run_remote_hash_chunks_incremental(con, bundles, before, None) == full
    )


def test_hybrid_compare_remote_vs_spark(spark, sf_dir):
    """hybrid_compare: DuckDB-side pushed hashing vs Spark-side
    fp_chain, per-chunk verdicts with zero data movement. Equal data
    -> all OK; a one-row remote mutation flips exactly that chunk."""
    from scribedb_spark.compat import hybrid_compare

    con = duckdb.connect()
    con.execute(
        f"create view nation as select * from read_parquet('{sf_dir}/nation.parquet')"
    )
    q = (
        "select '(' || concat_ws(',', cast(n_nationkey as varchar), n_name) || ')' "
        "as v from nation order by n_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    report = hybrid_compare(con, "duckdb", q, n, ["n_nationkey"], bucket_rows=10)
    assert len(report) >= 2
    assert all(r["status"] == "OK" for r in report)

    q_mut = q.replace(
        "n_name", "case when n_nationkey = 3 then 'XX' else n_name end"
    )
    report2 = hybrid_compare(
        con, "duckdb", q_mut, n, ["n_nationkey"], bucket_rows=10
    )
    bad = [r for r in report2 if r["status"] == "NOK"]
    assert [r["chunk_id"] for r in bad] == [0]  # key 3 lives in chunk 0


def test_hybrid_compare_remote_extra_rows_flagged(spark, sf_dir):
    """Chunk windows must be sized from max(local, remote) counts: a
    remote side with extra TRAILING rows (offsets >= n_local) used to
    fall outside every chunk window and report all-OK."""
    from scribedb_spark.compat import hybrid_compare

    con = duckdb.connect()
    con.execute(
        f"create view nation as select * from read_parquet('{sf_dir}/nation.parquet')"
    )
    # remote = nation + one extra row sorting AFTER every real key
    q_extra = (
        "select '(' || concat_ws(',', cast(n_nationkey as varchar), n_name) || ')' "
        "as v from (select n_nationkey, n_name from nation "
        "union all select 999, 'GHOST') order by n_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    report = hybrid_compare(con, "duckdb", q_extra, n, ["n_nationkey"], bucket_rows=10)
    bad = [r for r in report if r["status"] == "NOK"]
    # nation is 25 rows -> ghost row is remote offset 25, extending
    # chunk 2 (rows 20..25 remote vs 20..24 local): exactly that
    # chunk's hash diverges
    assert [r["chunk_id"] for r in bad] == [2]

    # symmetric case still works: local has a row the remote lacks
    q_short = (
        "select '(' || concat_ws(',', cast(n_nationkey as varchar), n_name) || ')' "
        "as v from nation where n_nationkey < 24 order by n_nationkey"
    )
    report2 = hybrid_compare(con, "duckdb", q_short, n, ["n_nationkey"], bucket_rows=10)
    assert any(r["status"] == "NOK" for r in report2)


def test_keyed_hybrid_compare_order_free(spark, sf_dir):
    """keyed_hybrid_compare: one unordered remote aggregation vs Spark
    fp_keyed_chunks. Equal data -> all OK even though the remote query
    carries NO ORDER BY; a one-row mutation flips exactly the mutated
    key's chunk; extra rows on the remote side surface as NOK without
    any count preflight."""
    import duckdb as _duckdb

    from scribedb_spark.compat import keyed_hybrid_compare

    con = _duckdb.connect()
    con.execute(
        f"create view nation as select * from read_parquet('{sf_dir}/nation.parquet')"
    )
    q = (
        "select n_nationkey as k, "
        "'(' || concat_ws(',', cast(n_nationkey as varchar), n_name) || ')' as v "
        "from nation"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    report = keyed_hybrid_compare(
        con, "duckdb", q, n, "n_nationkey", n_chunks=8
    )
    assert report and all(r["status"] == "OK" for r in report)
    assert sum(r["local_n"] for r in report) == n.count()

    q_mut = q.replace(
        "n_name)", "case when n_nationkey = 3 then 'XX' else n_name end)"
    )
    report2 = keyed_hybrid_compare(
        con, "duckdb", q_mut, n, "n_nationkey", n_chunks=8
    )
    bad = [r for r in report2 if r["status"] == "NOK"]
    assert len(bad) == 1
    assert bad[0]["remote_n"] == bad[0]["local_n"]  # value drift, not count

    q_extra = q + (
        " union all select 999 as k, '(999,ZZ)' as v"
    )
    report3 = keyed_hybrid_compare(
        con, "duckdb", q_extra, n, "n_nationkey", n_chunks=8
    )
    bad3 = [r for r in report3 if r["status"] == "NOK"]
    assert len(bad3) == 1
    assert bad3[0]["remote_n"] == bad3[0]["local_n"] + 1


def test_keyed_hybrid_incremental_recheck(spark, sf_dir):
    """The incremental WAN recheck end to end: fingerprint the base
    once (the 'persisted' artifact), apply a local delta with
    fp_delta_update — NO rescan of unchanged rows — and compare the
    maintained table against a remote side carrying the same change:
    all chunks OK. Against a remote missing the change: exactly the
    owning chunk NOK."""
    import duckdb as _duckdb
    from pyspark.sql import functions as F

    from scribedb_spark.canonical import fp_delta_update, fp_keyed_chunks
    from scribedb_spark.compat import keyed_hybrid_compare

    cols = ["n_nationkey", "n_name"]
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(*cols)
    base_fps = fp_keyed_chunks(n, "n_nationkey", cols, n_chunks=8)
    old = n.filter("n_nationkey = 3")
    new = old.withColumn("n_name", F.lit("RENAMED"))
    maintained = fp_delta_update(
        base_fps, old, new, "n_nationkey", cols, n_chunks=8
    )

    con = _duckdb.connect()
    con.execute(
        f"create view nation as select * from read_parquet('{sf_dir}/nation.parquet')"
    )
    q_changed = (
        "select n_nationkey as k, '(' || concat_ws(',', "
        "cast(n_nationkey as varchar), "
        "case when n_nationkey = 3 then 'RENAMED' else n_name end) || ')' as v "
        "from nation"
    )
    report = keyed_hybrid_compare(
        con, "duckdb", q_changed, None, "n_nationkey",
        n_chunks=8, local_fps=maintained,
    )
    assert report and all(r["status"] == "OK" for r in report)

    q_stale = (
        "select n_nationkey as k, '(' || concat_ws(',', "
        "cast(n_nationkey as varchar), n_name) || ')' as v from nation"
    )
    report2 = keyed_hybrid_compare(
        con, "duckdb", q_stale, None, "n_nationkey",
        n_chunks=8, local_fps=maintained,
    )
    assert [r["status"] for r in report2].count("NOK") == 1


def test_colfp_hybrid_compare_localizes_column(spark, sf_dir):
    """Remote per-column fingerprints vs the local column_fp_table:
    identical relations agree on every column; a one-cell mutation on
    the remote side flags exactly its column."""
    import duckdb

    from scribedb_spark.compat import colfp_hybrid_compare

    conn = duckdb.connect()
    conn.execute(
        "create table t as select o_orderkey as k, o_custkey, o_orderstatus,"
        f" o_orderpriority from read_parquet('{sf_dir}/orders.parquet')"
    )
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderkey as k", "o_custkey", "o_orderstatus", "o_orderpriority"
        )
    )
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    rep = colfp_hybrid_compare(conn, "duckdb", "select * from t", df, "k", cols)
    assert [r["status"] for r in rep] == ["OK", "OK", "OK"]

    conn.execute("update t set o_orderstatus = 'Z' where k = 7")
    rep = colfp_hybrid_compare(conn, "duckdb", "select * from t", df, "k", cols)
    by = {r["col_name"]: r["status"] for r in rep}
    assert by == {
        "o_custkey": "OK",
        "o_orderstatus": "NOK",
        "o_orderpriority": "OK",
    }
    conn.close()


def test_colfp_hybrid_composite_key_detects_swap(spark, sf_dir):
    """Composite keys pair cells against the FULL chr(2)-joined key:
    a value swap between two rows sharing the first key component
    (invisible to a keys[0]-only pairing — the round-7 advice bug)
    must flag the column."""
    import duckdb

    from scribedb_spark.compat import colfp_hybrid_compare

    conn = duckdb.connect()
    # two lineitem-shaped rows sharing k1, distinguished only by k2
    conn.execute(
        "create table t(k1 bigint, k2 bigint, v varchar);"
        "insert into t values (1, 1, 'a'), (1, 2, 'b'), (2, 1, 'c')"
    )
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (2, 1, "c")], "k1 long, k2 long, v string"
    )
    rep = colfp_hybrid_compare(
        conn, "duckdb", "select * from t", df, ["k1", "k2"], ["v"]
    )
    assert [r["status"] for r in rep] == ["OK"]

    # swap v between the two k1=1 rows: the multiset of (k1, cell)
    # pairs is unchanged — only the full composite key sees it
    conn.execute(
        "update t set v = CASE WHEN k2 = 1 THEN 'b' ELSE 'a' END WHERE k1 = 1"
    )
    rep = colfp_hybrid_compare(
        conn, "duckdb", "select * from t", df, ["k1", "k2"], ["v"]
    )
    assert [r["status"] for r in rep] == ["NOK"]
    conn.close()


def test_keyed_drop_failure_does_not_mask_result():
    """Round-6 ADVICE regression: run_remote_keyed_hash's cleanup is
    best-effort — a failing drop (e.g. Oracle's no-IF-EXISTS plain
    drop when the view was never created) must neither mask the hash
    result nor shadow the original exception."""
    import pytest

    from scribedb_spark.compat import keyed_remote_hash, run_remote_keyed_hash

    class Cursor:
        def __init__(self, fail_on):
            self.fail_on = fail_on
            self.rows = [(0, 2, 123), (1, 1, 456)]

        def execute(self, stmt):
            s = stmt.lower()
            for frag in self.fail_on:
                if frag in s:
                    raise RuntimeError(f"boom: {stmt}")

        def fetchall(self):
            return self.rows

        def close(self):
            pass

    class Conn:
        def __init__(self, fail_on):
            self._c = Cursor(fail_on)

        def cursor(self):
            return self._c

    bundle = keyed_remote_hash("oracle", "select 1 k, '1' v from dual", view_name="v")
    assert bundle.drop == ["drop view v"]  # plain drop for Oracle

    # drop raises -> result still returned
    out = run_remote_keyed_hash(Conn(["drop view"]), bundle)
    assert out == {0: (2, 123), 1: (1, 456)}

    # create_view raises -> ORIGINAL error surfaces even though the
    # cleanup drop also fails
    with pytest.raises(RuntimeError, match="create or replace view"):
        run_remote_keyed_hash(Conn(["create or replace view", "drop view"]), bundle)


def test_colfp_drop_failure_does_not_mask_result():
    """Same contract for the per-column bundle executor."""
    from scribedb_spark.compat import colfp_remote_hash, run_remote_colfp

    class Cursor:
        def execute(self, stmt):
            if "drop view" in stmt.lower():
                raise RuntimeError("boom")

        def fetchall(self):
            return [("c1", 11), ("c2", 22)]

        def close(self):
            pass

    class Conn:
        def cursor(self):
            return Cursor()

    bundle = colfp_remote_hash(
        "oracle", "select k, c1, c2 from t", "v", "k", ["c1", "c2"]
    )
    assert bundle.drop == ["drop view v"]
    assert run_remote_colfp(Conn(), bundle) == {"c1": 11, "c2": 22}
