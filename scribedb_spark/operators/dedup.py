"""Deduplication operators for training-data pipelines (north star;
SURVEY.md §2.10 `dedup_exact` / `dedup_near`).

Four families, each a `queries()` key with a DuckDB oracle where the
math is engine-portable (all hashing goes through md5 -> 60-bit int,
the same construction as canonical.fp_unordered, so Spark and DuckDB
agree bit-for-bit):

- exact          content-normalized exact dedup (hash groupBy)
- minhash LSH    shingle -> minhash signature -> banded LSH buckets
- simhash        16-bit simhash + hamming-distance pairs
- ngram jaccard  character-3-gram jaccard verification join

Scale design: every operator is explode -> groupBy -> self-join on a
*bucket key* (band signature / simhash / shingle), never an O(n^2)
cross join. At 100 TB the bucket self-joins are the standard LSH
pattern: candidates per bucket are bounded, AQE splits skewed buckets,
and the verification joins run only on candidate pairs. The
brute-force jaccard here restricts pairs to a blocking key (source)
— the un-blocked variant is operators.similarity.join_similarity with
prefix filtering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scribedb_spark.queries import register
from scribedb_spark.sources import table

#: minhash configuration: 16 hash functions in 4 bands of 4.
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS


def hash60(c: Column) -> Column:
    """60-bit integer hash of a string via md5 — portable (DuckDB:
    CAST('0x'||substr(md5(x),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens_distinct(text: Column) -> Column:
    return F.array_distinct(F.split(text, " "))


def shingles3(text: Column) -> Column:
    """Distinct 3-word shingles. The corpus vocabulary is tiny (~30
    words), so *unigram* sets of long documents are all identical —
    shingling is what makes set similarity discriminative (and is the
    standard LLM-dedup preprocessing: shingle -> minhash -> band)."""
    # zero-width lookahead captures overlapping 3-word windows at each
    # word start — one codegen'd regexp_extract_all beats an
    # interpreted transform(sequence, element_at x3) ~2.5x (verified
    # identical output)
    return F.array_distinct(
        F.regexp_extract_all(text, F.lit(r"(?<= |^)(?=(\S+ \S+ \S+))"), 1)
    )


def min_tokens_filter() -> Column:
    """Guard: callers filter to docs with >= 3 tokens (sequence()
    would run backwards below that; the synthetic corpus has none
    anyway). A function, not a module constant — Columns can't be
    built before a SparkContext exists."""
    return F.size(F.split(F.col("text"), " ")) >= 3

#: DuckDB twin of shingles3 (a FROM-clause fragment producing
#: (doc_id, source, tok) distinct shingle rows)
SQL_SHINGLES = """
      SELECT DISTINCT d.doc_id, d.source,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tok
      FROM (SELECT doc_id, source, string_split(text, ' ') AS w
            FROM documents) d
      CROSS JOIN (SELECT unnest(range(1, 5000)) AS i) ix
      WHERE i <= len(w) - 2
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS content_key,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY content_key
    HAVING COUNT(*) > 1
    """,
)
def dedup_exact(spark, sf_dir) -> DataFrame:
    """Exact dedup by normalized content key (sorted distinct token
    set — catches reordered/repeated-word copies, which is what the
    synthetic corpus contains; raw-text md5 would find nothing).
    One hash-groupBy: map-side partial agg, fully scalable."""
    d = table(spark, "documents", sf_dir)
    key = F.md5(F.array_join(F.array_sort(tokens_distinct(F.col("text"))), " "))
    return (
        d.groupBy(key.alias("content_key"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


_MINHASH_ORACLE = f"""
    WITH tok AS ({SQL_SHINGLES}),
    seeds AS (SELECT unnest(range({N_HASHES})) AS seed),
    mh AS (
      SELECT doc_id, seed,
             MIN(CAST(('0x' || substr(md5(concat(seed, ':', tok)), 1, 15)) AS BIGINT)) AS h
      FROM tok CROSS JOIN seeds GROUP BY doc_id, seed),
    sig AS (
      SELECT doc_id, seed // {ROWS_PER_BAND} AS band,
             md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY seed)) AS s
      FROM mh GROUP BY doc_id, seed // {ROWS_PER_BAND})
    SELECT DISTINCT a.doc_id AS doc_id1, b.doc_id AS doc_id2
    FROM sig a JOIN sig b ON a.band = b.band AND a.s = b.s AND a.doc_id < b.doc_id
    """


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark, sf_dir) -> DataFrame:
    """Near-dup candidate pairs via MinHash + banded LSH.

    shingle -> 16 minhashes -> 4 band signatures -> pairs sharing any
    band. Plan: one explode (doc x token x seed), one groupBy for
    signatures, one self-join on (band, sig) — the LSH bucket join.
    No cross join anywhere; bucket sizes bound the pair blow-up, and
    at scale the band join is an AQE-skew-handled shuffle join.
    """
    d = (
        table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .filter(min_tokens_filter())
    )
    # explode to (doc_id, shingle) rows, then compute all 16 hashes as
    # plain columns: md5/conv on flat rows stays inside whole-stage
    # codegen (a transform()-lambda formulation runs interpreted per
    # array element — measured ~7x slower); the groupBy(min x16) is
    # map-side partial, so the only shuffle carries one 16-long row
    # per doc.
    sh = d.select("doc_id", F.explode(shingles3(F.col("text"))).alias("tok"))
    hcols = [
        hash60(F.concat_ws(":", F.lit(seed), F.col("tok"))).alias(f"th{seed}")
        for seed in range(N_HASHES)
    ]
    hashed = sh.select("doc_id", *hcols)
    mh = hashed.groupBy("doc_id").agg(
        *[F.min(f"th{seed}").alias(f"h{seed}") for seed in range(N_HASHES)]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"h{b * ROWS_PER_BAND + i}").cast("string")
                    for i in range(ROWS_PER_BAND)
                ],
            )
        ).alias(f"band{b}")
        for b in range(N_BANDS)
    ]
    sigs = mh.select("doc_id", *band_cols)
    sig = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"band{b}").alias("s")
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.s").alias("s"))
    a = sig.select(F.col("doc_id").alias("doc_id1"), "band", "s")
    b = sig.select(F.col("doc_id").alias("doc_id2"), "band", "s")
    return (
        a.join(b, on=["band", "s"])
        .filter(F.col("doc_id1") < F.col("doc_id2"))
        .select("doc_id1", "doc_id2")
        .distinct()
    )


_SIMHASH_BITS = 16


def _simhash_sql() -> str:
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS b{k}"
        for k in range(_SIMHASH_BITS)
    )
    bit_join = " + ".join(
        f"(CASE WHEN b{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(_SIMHASH_BITS)
    )
    return f"""
    WITH tok AS ({SQL_SHINGLES}),
    h AS (
      SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok),
    bits AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id),
    sh AS (SELECT doc_id, {bit_join} AS simhash FROM bits),
    src AS (SELECT d.doc_id, d.source, s.simhash FROM documents d JOIN sh s USING (doc_id))
    SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM src a JOIN src b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@register("dedup_simhash", oracle=_simhash_sql())
def dedup_simhash(spark, sf_dir) -> DataFrame:
    """SimHash near-dup: 16-bit signature (sign of per-bit weight
    sums over token hashes), pairs within the same source at hamming
    distance <= 3.

    The source column is the blocking key (at 100 TB you'd block on
    simhash prefixes — pigeonhole over 4-bit quarters — instead of a
    metadata column; the signature computation is identical).
    """
    d = (
        table(spark, "documents", sf_dir)
        .select("doc_id", "source", "text")
        .filter(min_tokens_filter())
    )
    # explode shingles so the md5 and bit tests run codegen'd on flat
    # rows (not interpreted inside array lambdas); per-bit +-1 sums are
    # map-side partial aggregates — one compact shuffle of 16 ints/doc
    h = d.select(
        "doc_id", F.explode(shingles3(F.col("text"))).alias("tok")
    ).select("doc_id", hash60(F.col("tok")).alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), k).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{k}")
        for k in range(_SIMHASH_BITS)
    ]
    bits = h.groupBy("doc_id").agg(*bit_sums)
    simhash = None
    for k in range(_SIMHASH_BITS):
        term = F.when(F.col(f"b{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    sh = bits.select("doc_id", simhash.alias("simhash"))
    src = d.select("doc_id", "source").join(sh, "doc_id")
    a = src.select(
        F.col("doc_id").alias("doc_id1"), "source", F.col("simhash").alias("sh1")
    )
    b = src.select(
        F.col("doc_id").alias("doc_id2"), "source", F.col("simhash").alias("sh2")
    )
    ham = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2"))).cast("int")
    return (
        a.join(b, "source")
        .filter(F.col("doc_id1") < F.col("doc_id2"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= 3)
        .select("doc_id1", "doc_id2", "hamming")
    )


_NGRAM_ORACLE = """
    WITH sh AS (
      SELECT DISTINCT doc_id, substr(text, i, 3) AS g
      FROM documents, (SELECT unnest(range(1, 10000)) AS i) ix
      WHERE i <= length(text) - 2),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      JOIN documents da ON da.doc_id = a.doc_id
      JOIN documents db ON db.doc_id = b.doc_id
      WHERE da.source = db.source
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_id1, doc_id2,
           ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
    FROM pairs
    JOIN sz sa ON sa.doc_id = doc_id1
    JOIN sz sb ON sb.doc_id = doc_id2
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.9
    """


@register("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir) -> DataFrame:
    """Character-3-gram jaccard near-dup pairs (>= 0.9) within a
    source block.

    Shingling via sliding window expressions (sequence + transform —
    no UDF); intersection counts via the shingle self-join; jaccard
    verified exactly from set sizes. The source blocking key bounds
    the candidate join the same way LSH bands do for minhash.
    """
    d = (
        table(spark, "documents", sf_dir)
        .select("doc_id", "source", "text")
        .filter(F.length("text") >= 3)  # sequence() would run backwards
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length("text") - 2),
            lambda i: F.col("text").substr(i, F.lit(3)),
        )
    )
    # carry the shingle *array* per doc; the source block join pairs
    # docs, array_intersect computes |∩| in-row — one shuffle (the
    # block join), no shingle-level explode/join/groupBy
    g = d.select("doc_id", "source", grams.alias("gr"), F.size(grams).alias("n"))
    a = g.select(
        F.col("doc_id").alias("doc_id1"), "source",
        F.col("gr").alias("g1"), F.col("n").alias("n1"),
    )
    b = g.select(
        F.col("doc_id").alias("doc_id2"), "source",
        F.col("gr").alias("g2"), F.col("n").alias("n2"),
    )
    pairs = a.join(b, "source").filter(F.col("doc_id1") < F.col("doc_id2"))
    inter = F.size(F.array_intersect(F.col("g1"), F.col("g2")))
    jac = inter / (F.col("n1") + F.col("n2") - inter)
    return (
        pairs.filter(inter > 0)
        .filter(jac >= 0.9)
        .select("doc_id1", "doc_id2", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings)
    SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.42
    """,
)
def dedup_embedding_cosine(spark, sf_dir) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.42 over all pairs.

    This key is the *correctness baseline* (O(n^2) pair scan —
    fine at test SF). The scale path for the same semantics is
    operators.similarity (LSH-bucketed / blocked numpy), which this
    result validates against.
    """
    from scribedb_spark.functions.vector import cosine, to_double_array

    e = table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    a = e.select(
        F.col("vec_id").alias("vec_id1"), to_double_array("embedding").alias("va")
    )
    b = e.select(
        F.col("vec_id").alias("vec_id2"), to_double_array("embedding").alias("vb")
    )
    return (
        a.join(b, F.col("vec_id1") < F.col("vec_id2"))
        .filter(cosine(F.col("va"), F.col("vb")) >= 0.42)
        .select("vec_id1", "vec_id2")
    )
