"""Vector column functions (north-star extension, SURVEY.md §2.10).

All built-in expressions (zip_with / aggregate / sqrt) — JVM-side,
whole-stage-codegen-able, no Python in the hot path. The fold order of
``F.aggregate`` is the array's element order, so dot products are
bit-deterministic.

For bulk similarity (all-pairs / top-k over millions of vectors) the
scale path is ``scribedb_spark.operators.similarity`` which moves the
inner loop into Arrow-batched numpy (vectorized Pandas UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column) -> Column:
    """array<float> -> array<double> so arithmetic is double on both
    engine and oracle sides."""
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (norm(a) * norm(b))
