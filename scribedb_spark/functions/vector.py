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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scribedb_spark.queries import register
from scribedb_spark.sources import table


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


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance of two double arrays (fold order = element
    order, like dot/norm)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def quantize_int8(a: Column, scale: Column) -> Column:
    """Symmetric int8 quantization against a per-vector scale:
    q_i = floor(x_i / scale * 127 + 0.5). Element-wise doubles only —
    no sums, so (unlike norms/dots) the result is bit-exact across
    engines with no rounding tolerance needed. An all-zero vector
    (scale 0) divides by 1 instead — every engine then emits the
    all-zero code rather than NaN (sq_assign_cells' numpy path has
    the same guard; the DuckDB oracles mirror it with CASE WHEN)."""
    safe = F.when(scale == F.lit(0), F.lit(1.0)).otherwise(scale)
    return F.transform(
        a, lambda x: F.floor(x / safe * 127 + F.lit(0.5)).cast("int")
    )


@register(
    "vec_quantize_int8",
    oracle="""
    WITH d AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (
      SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS max_abs
      FROM d)
    SELECT vec_id, max_abs,
           array_to_string(
             list_transform(e, x -> CAST(floor(
               x / (CASE WHEN max_abs = 0 THEN 1 ELSE max_abs END) * 127 + 0.5
             ) AS INT)),
             ',') AS q8
    FROM s
    """,
)
def vec_quantize_int8(spark, sf_dir) -> DataFrame:
    """Max-abs int8 quantization of the embedding column — the
    standard storage/bandwidth lever for 100 TB vector corpora (4x
    smaller than float32; dot products stay sane after dequantize by
    max_abs/127). All element-wise codegen'd expressions; max_abs has
    no accumulation order (max is associative+commutative), so the
    whole key is exact without ROUND tolerances.

    The quantized vector is emitted as a canonical comma-joined string
    (not array<int>): integer-to-text is exact on both engines, and the
    differential driver canonicalizes results with a pandas sort that
    cannot order list-typed cells (round-3 `unhashable type: 'list'`
    err on this key)."""
    d = table(spark, "embeddings", sf_dir)
    e = to_double_array(F.col("embedding"))
    max_abs = F.array_max(F.transform(e, F.abs))
    return d.select(
        "vec_id",
        max_abs.alias("max_abs"),
        F.concat_ws(",", quantize_int8(e, max_abs)).alias("q8"),
    )


@register(
    "vec_centroid_label",
    oracle="""
    WITH x AS (
      SELECT label, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q
      FROM embeddings
      CROSS JOIN (SELECT unnest(range(1, 4097)) AS i) ix
      WHERE i <= len(embedding))
    SELECT label, dim,
           CAST(SUM(q) AS BIGINT) AS sum_micro,
           COUNT(*) AS n_vecs
    FROM x GROUP BY label, dim
    """,
)
def vec_centroid_label(spark, sf_dir) -> DataFrame:
    """Per-label embedding centroids as mergeable partial sums — the
    building block of clustering-based curation (SemDeDup-style
    semantic dedup, k-means assignment, per-class mean vectors). Emits
    (label, dim, sum_micro, n_vecs): the centroid component is
    sum_micro / n_vecs / 1e6, left to the consumer because the
    EXPORTED state must be the mergeable partial — at 100 TB centroids
    are reduced map-side per partition and merged, never averaged
    per-partition (averages of averages are wrong under skew).

    Exactness: each float is fixed-point-quantized by floor(x * 1e6)
    BEFORE summing — float->double promotion is exact, one multiply is
    correctly rounded identically in both engines, floor is exact, and
    integer sums are order-independent — so the result is bit-exact
    with no ROUND tolerance despite float inputs and Spark's
    non-deterministic partial-agg order (a double SUM here would
    hash-mismatch). Oracle cap: dims enumerated to 4096 (range limit);
    test embeddings are 64-d.

    Scale: one posexplode (map-only) + one (label, dim) groupBy with
    map-side partials — the shuffle carries 8-byte quantized terms,
    never float vectors. Output is labels x dims rows: tiny.
    """
    e = table(spark, "embeddings", sf_dir)
    pos = e.select("label", F.posexplode("embedding").alias("dim", "x"))
    q = F.floor(F.col("x").cast("double") * F.lit(1000000.0)).cast("long")
    return (
        pos.select("label", "dim", q.alias("q"))
        .groupBy("label", "dim")
        .agg(
            F.sum("q").alias("sum_micro"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )
