"""Skew-handling utilities (SURVEY.md §4 / north-star "salting for
skew").

AQE's skew-join split handles most skew automatically
(``spark.sql.adaptive.skewJoin.enabled`` is on in session.py), but it
only triggers on sort-merge joins with materialized statistics. These
helpers cover the cases AQE can't:

- ``salted_join``: explicit key salting for a shuffle join where one
  (or few) hot keys dominate — the classic N-way key split: the
  skewed side gets a random-but-deterministic salt in [0, N), the
  other side is replicated N ways, and the join key becomes
  (key, salt). Result is row-identical to the unsalted join.
- ``hot_keys``: find keys above a frequency threshold (the input to a
  targeted two-path join: salted for hot keys, plain for the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Keys whose frequency exceeds ``min_count`` — one aggregation,
    map-side combined; the result is small by construction (it's the
    skew tail) and broadcastable."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select(key)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join on ``key`` with the skewed side salted N ways.

    ``skewed`` rows get salt = pmod(xxhash64(whole row), N) — random
    enough to spread a hot key over N reducers, deterministic so
    re-runs agree. ``other`` is exploded N ways (its rows are
    replicated once per salt value), so every (key, salt) partition
    holds the full ``other`` slice for that key. Equivalent row-set to
    ``skewed.join(other, key, how)`` for inner/left joins.

    Cost model: the shuffle of ``other`` grows N-fold — use when
    ``other`` is much smaller than the hot partitions it eliminates
    (the usual fact-to-medium-dim skew case; for tiny dims just
    broadcast instead).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    s = skewed.withColumn("__salt", salt.cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = s.join(o, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def _register_keys() -> None:
    """Registry key lives behind a function so importing skew.py for
    the library API doesn't require the registry machinery."""
    from scribedb_spark.queries import d2, register
    from scribedb_spark.sources import table

    @register(
        "join_skew_salted",
        oracle="""
        WITH dim AS (
          SELECT l_returnflag,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS flag_qty
          FROM lineitem GROUP BY l_returnflag)
        SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, d.flag_qty
        FROM lineitem l JOIN dim d ON l.l_returnflag = d.l_returnflag
        """,
    )
    def join_skew_salted(spark, sf_dir) -> DataFrame:
        """Salted join on a maximally-skewed key (l_returnflag: 3
        values, so a plain shuffle join lands ALL data on 3 reducers
        at any cluster size). The salted plan spreads each hot key
        over 16 (key, salt) partitions; the oracle is the PLAIN join
        — hash-equality proves salting is invisible in the result.
        """
        li = table(spark, "lineitem", sf_dir).select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
        )
        dim = li.groupBy("l_returnflag").agg(
            F.sum(d2("l_quantity")).cast("double").alias("flag_qty")
        )
        out = salted_join(li, dim, "l_returnflag")
        return out.select("l_orderkey", "l_linenumber", "l_returnflag", "flag_qty")


_register_keys()
