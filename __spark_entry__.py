"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``scribedb_spark.queries`` — the operator-key registry
implementing SURVEY.md §2 (each key carries its Spark callable and,
where SQL-expressible, a DuckDB oracle twin).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary aggregation (TPC-H Q1 shape) over the
    sf0.001 driver data."""
    from scribedb_spark import queries as Q

    return Q.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from scribedb_spark import queries as Q

    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible key."""
    from scribedb_spark import queries as Q

    return Q.oracle_sql()
