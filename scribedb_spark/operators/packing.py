"""Sequence chunking & packing for training pipelines (north-star
extension, same family as operators/dedup.py).

Two preprocessing operators every LLM training-data pipeline runs
between curation and tokenizer sharding:

- chunk_split: split long documents into fixed-size overlapping token
  windows (context-length fitting). One explode over a computed
  index range — no UDF, no shuffle; output rows are (doc, chunk_idx,
  window text).

- pack_greedy: assign documents to fixed-token-budget packs
  (concat-and-chunk packing, GPT-style): documents are laid out in a
  deterministic order (source, doc_id) and a pack boundary falls
  every `budget` tokens; a document belongs to the pack where it
  STARTS. One window cumsum per source partition — a single shuffle,
  and the running sum is exact integer arithmetic.

Scale: chunking is embarrassingly parallel (map-only). Packing's
window runs per source partition (hash shuffle); at 100 TB packing is
normally run per output shard anyway, which is exactly this shape —
the `source` column stands in for the shard key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scribedb_spark.queries import register
from scribedb_spark.sources import table

CHUNK_TOKENS = 100
CHUNK_STEP = 80  # 20-token overlap
PACK_BUDGET = 4096


@register(
    "text_chunk_split",
    oracle=f"""
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id, i AS chunk_idx,
           array_to_string(w[i*{CHUNK_STEP}+1 : i*{CHUNK_STEP}+{CHUNK_TOKENS}], ' ')
             AS chunk_text,
           len(w[i*{CHUNK_STEP}+1 : i*{CHUNK_STEP}+{CHUNK_TOKENS}]) AS n_chunk_tokens
    FROM s CROSS JOIN (SELECT unnest(range(0, 10000)) AS i) ix
    WHERE i <= (len(w) - 1) // {CHUNK_STEP}
    """,
)
def text_chunk_split(spark, sf_dir) -> DataFrame:
    """Overlapping token-window chunking ({chunk} tokens, step
    {step}): the context-length fitting pass. slice() + array_join
    are codegen'd; the explode emits ceil(n/step) rows per doc and
    nothing shuffles."""
    d = table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    idx = F.explode(
        F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / CHUNK_STEP).cast("int"))
    )
    w = d.select("doc_id", toks.alias("w"), idx.alias("chunk_idx"))
    window = F.slice("w", F.col("chunk_idx") * CHUNK_STEP + 1, CHUNK_TOKENS)
    return w.select(
        "doc_id",
        "chunk_idx",
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).alias("n_chunk_tokens"),
    )


text_chunk_split.__doc__ = text_chunk_split.__doc__.format(
    chunk=CHUNK_TOKENS, step=CHUNK_STEP
)


@register(
    "text_pack_greedy",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS n_tokens
      FROM documents)
    SELECT doc_id, source, n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                // {PACK_BUDGET} AS BIGINT) AS pack_id
    FROM t
    """,
)
def text_pack_greedy(spark, sf_dir) -> DataFrame:
    """Concat-and-chunk packing: per source, documents in doc_id order
    are assigned pack_id = floor(tokens_before_this_doc / {budget}) —
    the pack their first token lands in. Exact integer window cumsum;
    one shuffle on the shard key."""
    d = table(spark, "documents", sf_dir)
    ntok = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "))) + 1
    ).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    t = d.select("doc_id", "source", ntok.alias("n_tokens"))
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(before / PACK_BUDGET).cast("long").alias("pack_id"),
    )


text_pack_greedy.__doc__ = text_pack_greedy.__doc__.format(budget=PACK_BUDGET)
