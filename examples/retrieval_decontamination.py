"""Retrieval + decontamination walkthrough: the round-8 span/BM25/RRF
slate end to end on the driver's documents/embeddings tables.

    python examples/retrieval_decontamination.py [sf_dir]

Stages (each a registered, oracle-checked query key — see
scribedb_spark/operators/dedup.py and curation.py):
 1. exact-substring span dedup        (dedup_span: overlapping 8-token
                                       windows, islands run-length)
 2. benchmark decontamination         (text_decontaminate: span
                                       collisions vs the pseudo-benchmark)
 3. lexical retrieval                 (text_bm25_topk: integer-exact
                                       BM25, query-by-example doc 42)
 4. dense + hybrid retrieval          (vec_cosine_topk arm +
                                       search_hybrid_rrf fusion)
The span table and the scored BM25 table each build ONCE per session
(scribedb_spark/cache.py) — stages 1+2 share the substring index,
stages 3+4 share the score table, mirroring the persisted-index
deployment shape at scale.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import scribedb_spark as ssp
from scribedb_spark import queries as Q


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    Q.load_extensions()
    spark = ssp.get_spark(app_name="retrieval-decon")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    spans = Q.REGISTRY["dedup_span"].fn(spark, sf_dir)
    worst = spans.orderBy(F.desc("max_dup_tokens"), "doc_id").limit(3)
    print("== span dedup: docs with the longest duplicated runs ==")
    worst.show(truncate=False)

    flagged = Q.REGISTRY["text_decontaminate"].fn(spark, sf_dir)
    n_flagged = flagged.count()
    n_quarantine = flagged.filter(F.col("verdict") == "quarantine").count()
    print(
        f"== decontamination: {n_flagged} docs share a benchmark span "
        f"({n_quarantine} quarantined) =="
    )
    flagged.orderBy(F.desc("hit_ratio"), "doc_id").show(5, truncate=False)

    print("== lexical: BM25 top-5 for 'more like doc 42' ==")
    Q.REGISTRY["text_bm25_topk"].fn(spark, sf_dir).limit(5).show()

    print("== hybrid: reciprocal-rank fusion (BM25 arm + cosine arm) ==")
    fused = Q.REGISTRY["search_hybrid_rrf"].fn(spark, sf_dir)
    fused.limit(5).show()
    both = fused.filter(
        (F.col("bm25_rank") > 0) & (F.col("vec_rank") > 0)
    ).count()
    print(
        f"{both} of the fused top-20 rank in BOTH arms "
        f"({time.perf_counter() - t0:.1f}s total)"
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
