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

Execution of these statements requires a live database connection
(e.g. via JDBC ``spark._sc._jvm`` drivers or an external runner) and
is intentionally out of scope here — generation is unit-tested, the
distributed path (canonical.fp_chain) is the engine default and is
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
