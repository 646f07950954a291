"""Scale smoke: measure how the heavy operators scale on an N-fold
corpus (default 4x sf0.1 ~ sf0.4), built by unioning the driver data
with key-shifted copies into /tmp.

This is the empirical half of the "would this hold at 100x" argument:
map-only / partial-agg keys should scale ~linearly in rows; pair-
producing dedup keys scale in CANDIDATE PAIRS, which an N-fold
duplicated corpus inflates ~N^2 inside every near-dup bucket — the
honest stress for LSH bucket bounds.

    python scripts/scale_smoke.py [mult] [base_sf_dir] [key,key,...]

Prints one JSON line per key: base seconds, scaled seconds, ratio,
rows produced at each scale (for pair-producing keys the row count IS
the emitted-pair count — the quantity wall time must track). The
optional third argument restricts the run to a comma-separated key
subset (used for the 16x octave on the pair-dense keys, where the
full list would be wastefully slow).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = [
    "q1_pricing_summary",
    "q18_large_volume",
    "fp_chain",
    "fp_chunk_hashes",
    "compare_verdict",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_levenshtein",
    "join_similarity",
    "sample_temperature",
    "vec_centroid_label",
    "profile_columns",
    "text_rare_bigrams",
    "text_shard_assign",
    "ann_pq_topk",
    "graph_pagerank",
    "rollup_gapfill",
    "dedup_bloom_prefilter",
    "dedup_url_canonical",
    "text_tfidf_topterms",
    "join_temporal_dim",
    "rollup_wau_sliding",
    "fp_incremental_update",
    "ann_ivf_sq_topk",
    "dedup_lsh_star",
    "dedup_semantic_ann",
    "vec_knn_graph_ann",
    "rollup_dataset_card",
    "stream_watermark_late",
    "compare_col_fingerprint",
    "dedup_containment",
    "agg_median_exact",
    "rollup_activity_streaks",
    "agg_distinct_bitmap",
    "graph_triangle_count",
    "multimodal_resize",
    "stream_stateful_stats",
    "profile_fk_orphans",
    "dedup_containment_salted",
    "dedup_containment_corpus",
    "dedup_paragraph",
    "join_similarity_topk",
    "ann_index_append",
    "dedup_span",
    "text_decontaminate",
    "text_bm25_topk",
    "search_hybrid_rrf",
]

#: per-table primary-key shifts so unioned copies stay key-unique;
#: FK pairs (orders/lineitem) shift together
SHIFTS = {
    "documents": [("doc_id", 10_000_000)],
    "embeddings": [("vec_id", 10_000_000)],
    "orders": [("o_orderkey", 100_000_000)],
    "lineitem": [("l_orderkey", 100_000_000)],
    "events": [("event_id", 100_000_000)],
}


def build_scaled(spark, base: str, out: str, mult: int) -> None:
    from pyspark.sql import functions as F

    from scribedb_spark.sources import TPCH_TABLES, table

    os.makedirs(out, exist_ok=True)
    for t in TPCH_TABLES:
        dst = f"{out}/{t}.parquet"
        if os.path.exists(dst + "/_SUCCESS"):
            continue
        df = table(spark, t, base)
        if t in SHIFTS:
            parts = []
            for i in range(mult):
                c = df
                for col, step in SHIFTS[t]:
                    c = c.withColumn(col, F.col(col) + F.lit(i * step))
                parts.append(c)
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
        else:  # dimension tables keep their keys (FKs stay valid)
            u = df
        u.write.mode("overwrite").parquet(dst)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    keys = sys.argv[3].split(",") if len(sys.argv) > 3 else KEYS
    out = f"/tmp/scale_smoke_x{mult}"

    from scribedb_spark import queries as Q
    from scribedb_spark.session import get_spark

    Q.load_extensions()
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark, base, out, mult)

    for key in keys:
        fn = Q.REGISTRY[key].fn
        try:
            t0 = time.perf_counter()
            n_base = fn(spark, base).count()
            t_base = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_scaled = fn(spark, out).count()
            t_scaled = time.perf_counter() - t0
        except Exception as e:  # record honest failures (capacity
            # guards, spills) instead of losing the whole run
            print(
                json.dumps(
                    {"key": key, "mult": mult, "err": str(e)[:300]}
                ),
                flush=True,
            )
            continue
        print(
            json.dumps(
                {
                    "key": key,
                    "mult": mult,
                    "base_s": round(t_base, 2),
                    "scaled_s": round(t_scaled, 2),
                    "ratio": round(t_scaled / max(t_base, 1e-9), 1),
                    "base_rows": n_base,
                    "scaled_rows": n_scaled,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
