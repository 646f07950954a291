"""Remote-hash compatibility mode (SURVEY.md §4 X1).

The reference's core optimization is pushing the hash computation
*into* the source database: it installs a chained-MD5 aggregate
server-side and fetches only one 32-char hash per chunk (reference
scribedb/postgres.py:47,65-67 and scribedb/oracle.py:107,146-148).
When this engine reads through JDBC, the default path pulls rows into
Spark; for WAN-separated databases the reference's strategy can still
win. This module *generates* the server-side SQL for that mode —
semantically equivalent statements written for this engine (own
naming/formulation; not copies of the reference's embedded SQL).

``run_remote_hash`` executes a bundle over any DBAPI connection
(install -> view -> hash -> drop), so remote-hash mode actually runs
end to end wherever a driver is available — the unit tests drive it
against DuckDB (the database this container has) and check the
remotely computed chain equals canonical.fp_chain's. The distributed
path (canonical.fp_chain) remains the engine default and is
oracle-verified. See tests/test_compat.py.
"""

from __future__ import annotations

from dataclasses import dataclass

#: namespace prefix for everything this engine installs remotely
PREFIX = "sdbs"


@dataclass
class RemoteHashSQL:
    """The statement bundle for one side of a remote-hash compare."""

    install: list[str]
    create_view: str
    hash_query: str
    drop: list[str]


def postgres_remote_hash(
    query: str, view_name: str, *, limit: int | None = None, offset: int | None = None
) -> RemoteHashSQL:
    """PostgreSQL statement bundle.

    Semantics mirror the reference's ordered-set aggregate (reference
    scribedb/postgres.py:17-30): state starts empty, each row folds as
    ``upper(md5(state || row::text))``, rows ordered by the whole row
    record. The fold recurrence must match canonical.fp_chain's
    reference-compat mode, so chunk hashes computed remotely and
    locally agree.
    """
    fn = f"{PREFIX}_md5_step"
    agg = f"{PREFIX}_md5_chain"
    window = ""
    if limit is not None:
        window += f" limit {limit}"
    if offset is not None:
        window += f" offset {offset}"
    return RemoteHashSQL(
        install=[
            (
                f"create or replace function {fn}(state text, val anyelement)\n"
                "returns text language sql immutable as\n"
                "$$ select upper(md5(state || val::text)) $$"
            ),
            (
                f"create or replace aggregate {agg}(anyelement)\n"
                f"(sfunc = {fn}, stype = text, initcond = '',\n"
                " parallel = unsafe)"
            ),
        ],
        create_view=f"create or replace view {view_name} as {query}{window}",
        hash_query=(
            f"select {agg}(v order by v) from {view_name} v"
        ),
        drop=[
            f"drop view if exists {view_name}",
            f"drop aggregate if exists {agg}(anyelement)",
            f"drop function if exists {fn}(text, anyelement)",
        ],
    )


#: the reference's whitespace-quoting rule, applied to each rendered
#: row before hashing (reference scribedb/oracle.py:60) — required for
#: byte parity with the PG composite rendering of the other side
_ORA_QUOTE = r"""regexp_replace(val, '(\w*\s[^,)]*)', '"\1"')"""


def oracle_remote_hash(
    query: str,
    view_name: str,
    cols: list[str],
    *,
    limit: int | None = None,
    offset: int | None = None,
) -> RemoteHashSQL:
    """Oracle statement bundle — ODCI user-defined aggregate.

    Reproduces the semantics of the reference's biggest single
    component (reference scribedb/oracle.py:18-88): a chained-MD5
    ODCI aggregate whose recurrence is
    ``state_hex <- RAWTOHEX(md5(state_hex || quote(row_text)))``
    with initial state '' — identical to the PostgreSQL fold in
    ``postgres_remote_hash`` (RAWTOHEX yields uppercase hex, matching
    PG's ``upper(md5(...))``). Rows render as ``'('||c1||','||...||')'``
    (``cols`` supplies the column expressions, the reference derives
    them by parsing the query — scribedb/oracle.py:170-187), the
    whitespace-quoting regexp of reference oracle.py:60 applies inside
    the aggregate, and the session NLS timestamp format is pinned to
    'YYYY-MM-DD HH24:MI:SS' (reference oracle.py:140) so timestamps
    render like the PG side. The ODCI method names are Oracle's fixed
    extensibility API; the type body here is this engine's own
    formulation.

    Note: like the reference's aggregate, the chain is only
    well-defined serially — ODCIAggregateMerge degrades to hashing
    the two partial states together (reference oracle.py:79-82), so a
    parallel-executed aggregation is NOT equal to the serial chain.
    Run with parallel DML disabled when byte parity matters.
    """
    typ = f"{PREFIX}_md5agg_t"
    fn = f"{PREFIX}_md5"
    window = ""
    if offset is not None:
        window += f" offset {offset} rows"
    if limit is not None:
        window += f" fetch next {limit} rows only"
    row_expr = "'('||" + "||','||".join(cols) + "||')'"
    type_spec = f"""create or replace type {typ} as object(
  h raw(16),
  static function odciaggregateinitialize(ctx in out {typ}) return number,
  member function odciaggregateiterate(self in out {typ}, val in clob) return number,
  member function odciaggregateterminate(self in out {typ}, result out varchar2, flags in number) return number,
  member function odciaggregatemerge(self in out {typ}, other in out {typ}) return number
)"""
    type_body = f"""create or replace type body {typ} is
  static function odciaggregateinitialize(ctx in out {typ}) return number is
  begin
    ctx := {typ}(null);
    return odciconst.success;
  end;

  member function odciaggregateiterate(self in out {typ}, val in clob) return number is
    state clob;
  begin
    if val is not null and length(val) > 0 then
      state := case when self.h is null then '' else rawtohex(self.h) end;
      self.h := dbms_crypto.hash(state || {_ORA_QUOTE}, dbms_crypto.hash_md5);
    end if;
    return odciconst.success;
  end;

  member function odciaggregateterminate(self in out {typ}, result out varchar2, flags in number) return number is
  begin
    result := rawtohex(self.h);
    return odciconst.success;
  end;

  member function odciaggregatemerge(self in out {typ}, other in out {typ}) return number is
  begin
    -- order-insensitive fallback; serial execution required for
    -- parity with the chained fold (see module docstring)
    self.h := dbms_crypto.hash(self.h || other.h, dbms_crypto.hash_md5);
    return odciconst.success;
  end;
end;"""
    return RemoteHashSQL(
        install=[
            "alter session set NLS_TIMESTAMP_FORMAT = 'YYYY-MM-DD HH24:MI:SS'",
            type_spec,
            type_body,
            f"create or replace function {fn} (input clob) return varchar2 parallel_enable aggregate using {typ}",
        ],
        create_view=f"create or replace view {view_name} as {query}{window}",
        hash_query=f"select {fn}({row_expr}) from {view_name}",
        drop=[
            f"drop view {view_name}",
            f"drop function {fn}",
            f"drop type {typ}",
        ],
    )


def duckdb_remote_hash(
    query: str, view_name: str, *, limit: int | None = None, offset: int | None = None
) -> RemoteHashSQL:
    """DuckDB statement bundle — no UDAF install needed; the chain is
    a list_reduce over the ordered row texts (the same construction
    the oracle gate uses for fp_chain). Useful for comparing a DuckDB
    file against a Spark dataset without moving rows."""
    window = ""
    if limit is not None:
        window += f" limit {limit}"
    if offset is not None:
        window += f" offset {offset}"
    return RemoteHashSQL(
        install=[],
        create_view=f"create or replace view {view_name} as {query}{window}",
        hash_query=(
            "select list_reduce(list_prepend('', list(v::varchar)),"
            " (x, y) -> upper(md5(x || y)))"
            f" from {view_name} v"
        ),
        drop=[f"drop view if exists {view_name}"],
    )


def chunked_bundles(
    kind: str,
    query: str,
    view_name: str,
    n_rows: int,
    bucket_rows: int,
    cols: list[str] | None = None,
) -> list[RemoteHashSQL]:
    """One bundle per chunk of ``bucket_rows`` rows — the reference's
    per-chunk view-rebuild loop (reference scribedb/base.py:156-170,
    main.py:216-247) expressed as data. ``query`` must carry a total
    ORDER BY, or chunk boundaries are not stable.

    Chunks map 1:1 to canonical.fp_chain's [i*b, (i+1)*b) windows, so
    remote chunk hashes line up against the Spark-computed chunk
    report (compare.chunk_fingerprints).
    """
    makers = {
        "postgres": lambda lo, w: postgres_remote_hash(
            query, f"{view_name}_{lo // bucket_rows}", limit=w, offset=lo
        ),
        "duckdb": lambda lo, w: duckdb_remote_hash(
            query, f"{view_name}_{lo // bucket_rows}", limit=w, offset=lo
        ),
        "oracle": lambda lo, w: oracle_remote_hash(
            query, f"{view_name}_{lo // bucket_rows}", cols or [], limit=w, offset=lo
        ),
    }
    try:
        mk = makers[kind]
    except KeyError:
        raise ValueError(f"unknown remote-hash dialect: {kind!r}") from None
    return [
        mk(lo, min(bucket_rows, n_rows - lo)) for lo in range(0, n_rows, bucket_rows)
    ]


def run_remote_hash(conn, bundle: RemoteHashSQL) -> str:
    """Execute one bundle over a DBAPI connection: install the
    aggregate, create the windowed view, fetch the ONE 32-hex-char
    chunk hash (the reference's whole point — only the hash crosses
    the wire, reference scribedb/postgres.py:47,65-67), then drop
    everything the bundle installed. Objects are dropped even when the
    hash query fails."""
    cur = conn.cursor()
    try:
        for s in bundle.install:
            cur.execute(s)
        cur.execute(bundle.create_view)
        cur.execute(bundle.hash_query)
        row = cur.fetchone()
        return row[0] if row else ""
    finally:
        for s in bundle.drop:
            try:
                cur.execute(s)
            except Exception:  # drop-on-best-effort, mirrors reference
                pass


def connect_dbapi(
    kind: str,
    database: str,
    *,
    user: str | None = None,
    password_env: str | None = None,
    init: list[str] | None = None,
):
    """Open a DBAPI connection for a remote-hash side. DuckDB ships in
    this environment; postgres/oracle need their drivers installed
    (psycopg2 / oracledb) — gated behind import so the CLI degrades
    with a clear message instead of an ImportError traceback. ``init``
    statements run once post-connect (view setup etc.)."""
    import os

    password = os.environ.get(password_env) if password_env else None
    if kind == "duckdb":
        import duckdb

        conn = duckdb.connect(database)
    elif kind == "postgres":
        try:
            import psycopg2
        except ImportError as e:
            raise RuntimeError(
                "remote-hybrid postgres side needs psycopg2 installed"
            ) from e
        conn = psycopg2.connect(database, user=user, password=password)
    elif kind == "oracle":
        try:
            import oracledb
        except ImportError as e:
            raise RuntimeError(
                "remote-hybrid oracle side needs oracledb installed"
            ) from e
        conn = oracledb.connect(dsn=database, user=user, password=password)
    else:
        raise ValueError(f"unknown remote-hash dialect: {kind!r}")
    cur = conn.cursor()
    for stmt in init or []:
        cur.execute(stmt)
    return conn


def remote_count(conn, query: str) -> int:
    """One COUNT(*) scalar over the wire — the reference counts each
    side before chunking (reference scribedb/base.py:114-121) and so
    must we: sizing chunk windows from the LOCAL count alone would
    leave remote rows at offsets >= n_local un-hashed by every chunk,
    silently passing a remote side with extra trailing rows."""
    cur = conn.cursor()
    cur.execute(f"select count(*) from ({query}) scdb_cnt")
    row = cur.fetchone()
    return int(row[0]) if row else 0


def run_remote_hash_chunks(conn, bundles: list[RemoteHashSQL]) -> list[str]:
    """Sequential per-chunk execution of ``chunked_bundles`` output.
    Sequential is intentional: the chained fold is order-sensitive and
    the reference's thread pool around this loop was broken by design
    (reference main.py:170-175; SURVEY.md §3)."""
    return [run_remote_hash(conn, b) for b in bundles]


def run_remote_hash_chunks_incremental(
    conn,
    bundles: list[RemoteHashSQL],
    prev: list[str] | None,
    dirty: set[int] | None,
) -> list[str]:
    """Chunk re-hash with re-use: the remote-side analog of
    fp_incremental_update's delta-driven recompute. A caller that
    knows which chunks a mutation touched (CDC feed, audit log, the
    previous compare's NOK set) passes the prior hashes and the dirty
    chunk ids; only dirty chunks — plus chunks with no prior hash
    (window growth) — pay a remote hash query, clean chunks re-use
    ``prev`` verbatim. ``prev=None`` or ``dirty=None`` degrades to
    the full sequential run.

    Exactness requires ``dirty`` to be a SUPERSET of the chunks whose
    window contents changed, under stable chunk windows: same total
    ORDER BY, same bucket size, equal row count. An insert or delete
    shifts every later row across chunk boundaries — for those, pass
    dirty = all chunks at-or-after the edit point (the same rule
    compare.fp_incremental_update documents for the local fold)."""
    if prev is None or dirty is None:
        return run_remote_hash_chunks(conn, bundles)
    return [
        prev[i] if i < len(prev) and i not in dirty else run_remote_hash(conn, b)
        for i, b in enumerate(bundles)
    ]


def hybrid_compare(
    conn,
    kind: str,
    remote_query: str,
    df,
    sort_keys: list[str],
    bucket_rows: int = 100_000,
    cols: list[str] | None = None,
    view_name: str = "scdb_hybrid",
) -> list[dict]:
    """The reference's headline scenario composed end to end: one side
    lives in a remote database (hashing pushed INTO it — only 32 hex
    chars per chunk cross the wire, reference scribedb/postgres.py:47,
    65-67), the other side is a Spark DataFrame fingerprinted by
    canonical.fp_chain — and the verdict is a per-chunk OK/NOK report
    without a single data row leaving either engine.

    ``remote_query`` must project ONE column ``v``: the canonical
    ``(a,b,...)`` row text, with a total ORDER BY matching
    ``sort_keys`` order on the Spark side.

    Returns [{chunk_id, remote_fp, local_fp, status}] — the same
    shape as compare.chunk_fingerprints, so downstream tooling
    (CLI printing, fingerprint_delta persistence) works unchanged.
    At 100 TB the Spark side is a parallel fold; the remote side runs
    at whatever the source database can hash — the reference's
    calibration problem, unchanged by design (SURVEY.md §4 X2).
    """
    from scribedb_spark.canonical import fp_chain

    local = {
        r["chunk_id"]: r["fp"]
        for r in fp_chain(df, sort_keys, bucket_rows, cols=cols).collect()
    }
    # chunk windows must span BOTH sides: windows sized from the local
    # count alone would never hash remote rows at offsets >= n_local,
    # reporting all-OK against a remote side with extra trailing rows
    # (local-extra chunks were already caught via the `local - remote`
    # sweep below — this closes the asymmetry)
    n_rows = max(df.count(), remote_count(conn, remote_query))
    bundles = chunked_bundles(
        kind, remote_query, view_name, n_rows, bucket_rows
    )
    remote = run_remote_hash_chunks(conn, bundles)
    out = []
    for i, rh in enumerate(remote):
        lh = local.get(i)
        out.append(
            {
                "chunk_id": i,
                "remote_fp": rh,
                "local_fp": lh,
                "status": "OK" if lh is not None and rh == lh else "NOK",
            }
        )
    for cid in sorted(set(local) - set(range(len(remote)))):
        out.append(
            {
                "chunk_id": cid,
                "remote_fp": None,
                "local_fp": local[cid],
                "status": "NOK",
            }
        )
    return out


# ---------------------------------------------------------------------------
# keyed-chunk remote hashing — commutative, order-free, one round trip
# ---------------------------------------------------------------------------

#: 2^61 - 1, matching canonical.FP_MOD (kept literal here so generated
#: SQL is self-contained)
_FP_MOD = 2305843009213693951


def keyed_remote_hash(
    kind: str, query: str, view_name: str, n_chunks: int = 64
) -> RemoteHashSQL:
    """Statement bundle computing the KEYED-CHUNK commutative
    fingerprint table remotely: one aggregation query returning
    (chunk_id, n_rows, fp) rows — the remote twin of
    canonical.fp_keyed_chunks.

    ``query`` must project TWO columns: ``k`` (the chunking key) and
    ``v`` (the canonical ``(a,b,...)`` row text). Contrast with the
    chained-MD5 bundles above, which mirror the reference's scheme and
    inherit its costs: a total ORDER BY on the remote side, a
    count-first round trip, and one view rebuild + query per chunk
    (reference scribedb/base.py:156-170). The commutative sum needs
    NONE of that — unordered scan, single round trip, and chunk
    membership is a pure key function so both sides bucket identically
    without coordinating row numbers. This is the mode to prefer when
    both sides are under this engine's control; the chained bundles
    remain for reference parity.
    """
    p = _FP_MOD
    if kind == "duckdb":
        hq = (
            f"select cast(('0x' || substr(md5(cast(k as varchar)), 1, 15))"
            f" as bigint) % {n_chunks} as chunk_id,"
            f" count(*) as n_rows,"
            f" cast(sum(cast(('0x' || substr(md5(v), 1, 15)) as bigint))"
            f" % {p} as bigint) as fp"
            f" from {view_name} group by 1 order by 1"
        )
    elif kind == "postgres":
        hq = (
            f"select (('x' || substr(md5(k::text), 1, 15))::bit(60)::bigint)"
            f" % {n_chunks} as chunk_id,"
            f" count(*) as n_rows,"
            f" mod(sum((('x' || substr(md5(v), 1, 15))::bit(60)::bigint)"
            f"::numeric), {p})::bigint as fp"
            f" from {view_name} group by 1 order by 1"
        )
    elif kind == "oracle":
        hq = (
            f"select mod(to_number(substr(standard_hash(to_char(k), 'MD5'),"
            f" 1, 15), 'xxxxxxxxxxxxxxx'), {n_chunks}) as chunk_id,"
            f" count(*) as n_rows,"
            f" mod(sum(to_number(substr(standard_hash(v, 'MD5'), 1, 15),"
            f" 'xxxxxxxxxxxxxxx')), {p}) as fp"
            f" from {view_name}"
            f" group by mod(to_number(substr(standard_hash(to_char(k), 'MD5'),"
            f" 1, 15), 'xxxxxxxxxxxxxxx'), {n_chunks}) order by 1"
        )
    else:
        raise ValueError(f"unknown remote-hash dialect: {kind!r}")
    # Oracle (pre-23c) has no DROP VIEW IF EXISTS — use the plain form,
    # matching oracle_remote_hash; run_remote_keyed_hash tolerates drop
    # failures so cleanup can't mask the compare outcome either way.
    drop = (
        [f"drop view {view_name}"]
        if kind == "oracle"
        else [f"drop view if exists {view_name}"]
    )
    return RemoteHashSQL(
        install=[],
        create_view=f"create or replace view {view_name} as {query}",
        hash_query=hq,
        drop=drop,
    )


def run_remote_keyed_hash(conn, bundle: RemoteHashSQL) -> dict[int, tuple[int, int]]:
    """Execute a keyed-chunk bundle; returns {chunk_id: (n_rows, fp)}."""
    cur = conn.cursor()
    try:
        for stmt in bundle.install:
            cur.execute(stmt)
        cur.execute(bundle.create_view)
        cur.execute(bundle.hash_query)
        return {int(c): (int(n), int(f)) for c, n, f in cur.fetchall()}
    finally:
        for stmt in bundle.drop:
            # best-effort cleanup: a failed drop (e.g. the view was
            # never created because create_view itself raised) must not
            # shadow the hash result or the original exception
            try:
                cur.execute(stmt)
            except Exception:
                pass
        cur.close()


def keyed_hybrid_compare(
    conn,
    kind: str,
    remote_query: str,
    df,
    key: str,
    cols: list[str] | None = None,
    n_chunks: int = 64,
    view_name: str = "scdb_keyed",
    local_fps=None,
) -> list[dict]:
    """Order-free hybrid compare: remote side computes its keyed-chunk
    fingerprint table in ONE aggregation round trip
    (keyed_remote_hash); local side is canonical.fp_keyed_chunks over
    a Spark DataFrame. Chunks compare by id across the UNION of both
    sides, so extra rows on EITHER side surface as NOK — no
    count-first preflight, no ORDER BY calibration, no per-chunk view
    loop (the three costs hybrid_compare inherits from the
    reference's chained scheme). Pass ``local_fps`` (a DataFrame in
    fp_keyed_chunks shape — e.g. a PERSISTED artifact maintained by
    fp_delta_update; ``df`` is then ignored) and a re-check moves
    |delta| hashing locally and one aggregate remotely; chunks
    emptied by deletes (n_rows=0) count as absent.

    Returns [{chunk_id, remote_n, local_n, remote_fp, local_fp,
    status}] sorted by chunk_id."""
    from pyspark.sql import functions as F

    from scribedb_spark.canonical import FP_MOD, fp_keyed_chunks

    fps = (
        local_fps
        if local_fps is not None
        else fp_keyed_chunks(df, key, cols, n_chunks)
    )
    local = {
        r["chunk_id"]: (r["n_rows"], r["fp"])
        for r in fps.select(
            "chunk_id",
            "n_rows",
            F.pmod(F.col("fp_sum"), F.lit(FP_MOD)).cast("long").alias("fp"),
        )
        .filter(F.col("n_rows") != 0)
        .collect()
    }
    remote = run_remote_keyed_hash(
        conn, keyed_remote_hash(kind, remote_query, view_name, n_chunks)
    )
    out = []
    for cid in sorted(set(local) | set(remote)):
        ln, lf = local.get(cid, (0, None))
        rn, rf = remote.get(cid, (0, None))
        out.append(
            {
                "chunk_id": cid,
                "remote_n": rn,
                "local_n": ln,
                "remote_fp": rf,
                "local_fp": lf,
                "status": "OK" if ln == rn and lf == rf and lf is not None else "NOK",
            }
        )
    return out


def colfp_remote_hash(
    kind: str,
    query: str,
    view_name: str,
    key: str | list[str],
    cols: list[str],
    n_cols_mod: int = _FP_MOD,
) -> RemoteHashSQL:
    """Per-COLUMN fingerprint bundle: ONE remote aggregation round
    trip returns (col_name, fp) for every compared column — the WAN
    form of compare.column_fp_table. Each column's fp is the 60-bit
    md5 slice of '(key):(cell)' summed and reduced mod 2^61-1, the
    same recurrence as the Spark side, so a local column_fp_table
    over the engine's copy and this remote aggregate agree
    bit-for-bit on int/varchar cells (other types need an explicit
    cast in ``query`` matching canonical_cell's rendering).

    ``cols`` are column names exposed by ``query``; ``key`` is the
    pairing key column (or a composite key list, joined with chr(2)
    exactly like compare.column_fp_table's concat_ws('\\x02', keys)
    so a value swap between rows sharing a key prefix still flips
    the fingerprint). NULL cells hash as chr(1), matching the Spark
    side's coalesce marker.
    """
    p = n_cols_mod
    keys = [key] if isinstance(key, str) else list(key)

    def key_expr() -> str:
        if kind == "duckdb":
            parts = ", ".join(f"cast({k} as varchar)" for k in keys)
            return parts if len(keys) == 1 else f"concat_ws(chr(2), {parts})"
        if kind == "postgres":
            parts = ", ".join(f"{k}::text" for k in keys)
            return parts if len(keys) == 1 else f"concat_ws(chr(2), {parts})"
        if kind == "oracle":
            # no concat_ws before 23c; keys are non-null by contract
            return " || chr(2) || ".join(f"to_char({k})" for k in keys)
        raise ValueError(f"unknown remote-hash dialect: {kind!r}")

    kx = key_expr()

    def branch(c: str) -> str:
        if kind == "duckdb":
            return (
                f"select '{c}' as col_name,"
                f" cast(sum(cast(('0x' || substr(md5({kx}"
                f" || ':' || coalesce(cast({c} as varchar), chr(1))), 1, 15))"
                f" as bigint)) % {p} as bigint) as fp"
                f" from {view_name}"
            )
        if kind == "postgres":
            return (
                f"select '{c}' as col_name,"
                f" mod(sum((('x' || substr(md5({kx}"
                f" || ':' || coalesce({c}::text, chr(1))), 1, 15))"
                f"::bit(60)::bigint)::numeric), {p})::bigint as fp"
                f" from {view_name}"
            )
        if kind == "oracle":
            return (
                f"select '{c}' as col_name,"
                f" mod(sum(to_number(substr(standard_hash({kx}"
                f" || ':' || nvl(to_char({c}), chr(1)), 'MD5'), 1, 15),"
                f" 'xxxxxxxxxxxxxxx')), {p}) as fp"
                f" from {view_name}"
            )
        raise ValueError(f"unknown remote-hash dialect: {kind!r}")

    hq = " union all ".join(branch(c) for c in cols)
    drop = (
        [f"drop view {view_name}"]
        if kind == "oracle"
        else [f"drop view if exists {view_name}"]
    )
    return RemoteHashSQL(
        install=[],
        create_view=f"create or replace view {view_name} as {query}",
        hash_query=hq,
        drop=drop,
    )


def run_remote_colfp(conn, bundle: RemoteHashSQL) -> dict[str, int]:
    """Execute a per-column fingerprint bundle; returns {col: fp}."""
    cur = conn.cursor()
    try:
        for stmt in bundle.install:
            cur.execute(stmt)
        cur.execute(bundle.create_view)
        cur.execute(bundle.hash_query)
        return {str(c): int(f) for c, f in cur.fetchall()}
    finally:
        for stmt in bundle.drop:
            try:
                cur.execute(stmt)
            except Exception:
                pass
        cur.close()


def colfp_hybrid_compare(
    conn,
    kind: str,
    remote_query: str,
    df,
    key: str | list[str],
    cols: list[str],
    view_name: str = "scdb_colfp",
) -> list[dict]:
    """WAN column drill: remote side computes every column's
    fingerprint in ONE aggregation round trip (|cols| * 8 bytes over
    the wire); local side is compare.column_fp_table with matching
    cast-to-string cells. ``key`` may be a composite list — both
    sides pair cells against the full chr(2)-joined key. Returns
    [{col_name, remote_fp, local_fp, status}] sorted by col_name."""
    from pyspark.sql import functions as F

    from scribedb_spark.compare import column_fp_table

    keys = [key] if isinstance(key, str) else list(key)
    remote = run_remote_colfp(
        conn, colfp_remote_hash(kind, remote_query, view_name, keys, cols)
    )
    cells = {c: F.col(c).cast("string") for c in cols}
    local = {
        r["col_name"]: r["fp"]
        for r in column_fp_table(df, keys, cols, cells).collect()
    }
    out = []
    for c in sorted(cols):
        rf, lf = remote.get(c), local.get(c)
        out.append(
            {
                "col_name": c,
                "remote_fp": rf,
                "local_fp": lf,
                "status": "OK" if rf == lf and rf is not None else "NOK",
            }
        )
    return out
