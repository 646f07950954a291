"""Differential tests: every SQL-checkable query key vs its DuckDB
oracle — a local mirror of the driver's t2 harness (row count, column
names, order-insensitive exact values) at sf0.001."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pytest

from scribedb_spark.sources import TPCH_TABLES


@pytest.fixture(scope="module")
def qmod():
    from scribedb_spark import queries as Q

    Q.load_extensions()
    return Q


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _normalize(df):
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()
    ]
    return cols, sorted(rows)


def get_keys():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scribedb_spark import queries as Q

    Q.load_extensions()
    return sorted(k for k, v in Q.REGISTRY.items() if v.oracle)


@pytest.mark.parametrize("key", get_keys())
def test_query_matches_oracle(spark, sf_dir, qmod, duck, key):
    qd = qmod.REGISTRY[key]
    sdf = qd.fn(spark, sf_dir).toPandas()
    odf = duck.execute(qd.oracle).df()
    assert len(sdf) == len(odf), f"{key}: row count {len(sdf)} != oracle {len(odf)}"
    scols, srows = _normalize(sdf)
    ocols, orows = _normalize(odf)
    assert scols == ocols, f"{key}: columns {scols} != {ocols}"
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ][:5]
    assert not mism, f"{key}: first value mismatches: {mism}"
