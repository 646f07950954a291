"""Training-data pipeline walkthrough: the north-star operators end to
end on the driver's documents/embeddings tables.

    python examples/llm_pipeline.py [sf_dir]

Stages (each a registered, oracle-checked query key — see
scribedb_spark/queries.py):
 1. text quality + language scoring        (text_quality_score, text_lang_id)
 2. exact dedup by normalized content key  (dedup_exact)
 3. near-dup candidates via MinHash LSH    (dedup_minhash_lsh)
 4. embedding near-dups + ANN search       (dedup_embedding_cosine, ann_lsh_topk)
 5. multimodal feature extraction          (multimodal_features)
 6. composed curation ledger               (pipeline_curation)
 7. chunking + sequence packing            (text_chunk_split, text_pack_greedy)
 8. int8 embedding quantization            (vec_quantize_int8)
The final "keep" set = documents minus exact-dup losers minus near-dup
losers (keep the lowest doc_id of each cluster).
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
    spark = ssp.get_spark(app_name="llm-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    from scribedb_spark.sources import table

    documents = table(spark, "documents", sf_dir)
    n_docs = documents.count()

    quality = Q.REGISTRY["text_quality_score"].fn(spark, sf_dir)
    low_q = quality.filter(F.col("quality") < 0.3).count()

    exact = Q.REGISTRY["dedup_exact"].fn(spark, sf_dir)
    n_exact_groups = exact.count()

    near = Q.REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)
    # near-dup losers: the higher doc_id of every candidate pair
    losers = near.select(F.col("doc_id2").alias("doc_id")).distinct()
    keep = documents.join(losers, "doc_id", "left_anti")
    n_keep = keep.count()

    emb_pairs = Q.REGISTRY["dedup_embedding_cosine"].fn(spark, sf_dir).count()
    sem = Q.REGISTRY["dedup_semantic_ann"].fn(spark, sf_dir)
    sem_dropped = sem.filter(F.col("keep") == 0).count()
    contained = Q.REGISTRY["dedup_containment"].fn(spark, sf_dir).count()
    ann = Q.REGISTRY["ann_lsh_topk"].fn(spark, sf_dir).count()
    ann_pq = Q.REGISTRY["ann_pq_topk"].fn(spark, sf_dir).count()
    mm = Q.REGISTRY["multimodal_features"].fn(spark, sf_dir).count()
    dup_frames = Q.REGISTRY["multimodal_frame_dedup"].fn(spark, sf_dir).count()

    ledger = Q.REGISTRY["pipeline_curation"].fn(spark, sf_dir)
    led = ledger.agg(
        F.sum("n_docs").alias("d"), F.sum("total_tokens").alias("t")
    ).first()
    n_chunks = Q.REGISTRY["text_chunk_split"].fn(spark, sf_dir).count()
    n_packs = (
        Q.REGISTRY["text_pack_greedy"].fn(spark, sf_dir)
        .select("source", "pack_id").distinct().count()
    )
    n_quant = Q.REGISTRY["vec_quantize_int8"].fn(spark, sf_dir).count()

    # round-4 curation surface: decontamination, repetition gating,
    # PII audit, stratified mixing, shard layout
    n_contam = Q.REGISTRY["dedup_cross_corpus"].fn(spark, sf_dir).count()
    rep = Q.REGISTRY["text_repetition"].fn(spark, sf_dir)
    n_repetitive = rep.filter(F.col("dup_frac") > 0.8).count()
    pii = Q.REGISTRY["text_pii_redact"].fn(spark, sf_dir)
    n_redacted = pii.agg(F.sum("n_digits").alias("n")).first()["n"]
    n_sampled = Q.REGISTRY["sample_stratified"].fn(spark, sf_dir).count()
    shards = Q.REGISTRY["pipeline_shard_ledger"].fn(spark, sf_dir)
    sh = shards.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_docs").alias("lo"),
        F.max("n_docs").alias("hi"),
    ).first()

    print(f"documents:              {n_docs}")
    print(f"low-quality (<0.3):     {low_q}")
    print(f"exact-dup groups:       {n_exact_groups}")
    print(f"near-dup losers pruned: {n_docs - n_keep}")
    print(f"kept after dedup:       {n_keep}")
    print(f"embedding near-dup pairs: {emb_pairs}")
    print(f"semantic dups dropped (ANN cells): {sem_dropped}")
    print(f"batch docs contained in corpus:    {contained}")
    print(f"ANN results (10 queries x top-5): {ann}")
    print(f"PQ/ADC results (4-bit codes):     {ann_pq}")
    print(f"multimodal feature rows:  {mm}")
    print(f"duplicate frames found:   {dup_frames}")
    print(f"curation ledger: {led['d']} docs kept, {led['t']} tokens")
    print(f"training chunks (100-tok, 20 overlap): {n_chunks}")
    print(f"packed sequences (4096-tok budget):    {n_packs}")
    print(f"int8-quantized embeddings: {n_quant}")
    print(f"eval-contaminated train docs: {n_contam}")
    print(f"highly repetitive (dup_frac>0.8): {n_repetitive}")
    print(f"PII digits redacted (customer): {n_redacted}")
    print(f"stratified sample kept: {n_sampled}")
    print(
        f"training shards: {sh['n']} "
        f"(docs/shard {sh['lo']}-{sh['hi']})"
    )
    # round-7 additions: soft-dedup reweighting + the promotion gate
    w = Q.REGISTRY["sample_dedup_weights"].fn(spark, sf_dir)
    down = w.filter(F.col("weight_ppm") < 1000000).count()
    gate = Q.REGISTRY["pipeline_quality_gate"].fn(spark, sf_dir).collect()
    verdict = ", ".join(
        f"{r['check_name']}={'PASS' if r['passed'] else 'FAIL'}" for r in gate
    )
    print(f"soft-dedup downweighted docs: {down}")
    print(f"quality gate: {verdict}")
    # round-8 additions: LM typicality filter, mixing budget, dense-core
    # audit, and the dedup-index recall monitor
    lm = Q.REGISTRY["text_lm_score"].fn(spark, sf_dir)
    lm_tail = lm.filter(F.col("avg_lm_pts") < 10000).count()
    mix = Q.REGISTRY["sample_token_budget"].fn(spark, sf_dir)
    mx = mix.agg(
        F.sum("expected_toks").alias("t"), F.sum("capped").alias("c")
    ).first()
    cores = Q.REGISTRY["graph_kcore"].fn(spark, sf_dir)
    dense = cores.filter(F.col("core_est") >= 3).count()
    rec = Q.REGISTRY["dedup_recall_report"].fn(spark, sf_dir).collect()
    curve = ", ".join(
        f"J{r['bucket']/10:.1f}+: {r['recall_ppm']/10000:.0f}%"
        f" (theory {r['theory_ppm']/10000:.0f}%)"
        for r in sorted(rec, key=lambda r: r["bucket"])
    )
    print(f"LM-atypical docs (<1% mean transition ppm): {lm_tail}")
    print(
        f"mixing budget: {mx['t']} tokens planned, "
        f"{mx['c']} sources epoch-capped"
    )
    print(f"dense-core docs (3-core+ in the near-dup graph): {dense}")
    print(f"LSH recall curve: {curve}")
    # round-9 additions: the persisted-index lifecycle (build once,
    # write to warehouse parquet, every later session reloads — the
    # *_index_persist keys serve from the reload and hash-match their
    # from-scratch oracles), the trained-filter shape, and the
    # dataset-card mix report
    from scribedb_spark import persist as P

    n_persist_pairs = Q.REGISTRY["dedup_index_persist"].fn(spark, sf_dir).count()
    bm25_top = Q.REGISTRY["bm25_index_persist"].fn(spark, sf_dir).count()
    built = len(P.BUILD_EVENTS)
    clf = Q.REGISTRY["text_quality_classifier"].fn(spark, sf_dir)
    clf_drop = clf.filter(F.col("keep") == 0).count()
    card = Q.REGISTRY["rollup_domain_mix"].fn(spark, sf_dir).collect()
    card_line = ", ".join(
        f"{r['source']}: {r['kept_docs']}/{r['n_docs']} kept"
        f" ({r['dedup_ppm']/10000:.1f}% dup), repeat x{r['repeat_ppm']/1e6:.2f}"
        for r in sorted(card, key=lambda r: r["source"])[:4]
    )
    print(
        f"persisted LSH index pairs (served from warehouse): {n_persist_pairs}"
        f" | BM25 from persisted postings: top-{bm25_top}"
        f" | artifacts built this session: {built}"
        " (0 = everything reloaded)"
    )
    print(f"classifier-rejected docs: {clf_drop}")
    print(f"dataset card: {card_line}")
    # round-10 additions: day-2 operations — the warehouse catalog,
    # the three monitor->act gates (index recall, LM vocabulary,
    # quality distribution), incremental PQ maintenance, and the
    # partition-layout preflight
    cat = Q.REGISTRY["rollup_artifact_catalog"].fn(spark, sf_dir)
    n_art = cat.count()
    stale = cat.filter(F.col("nonempty") == 0).count()
    gate_ann = Q.REGISTRY["ann_retrain_gate"].fn(spark, sf_dir).first()
    gate_lm = Q.REGISTRY["lm_drift_gate"].fn(spark, sf_dir).first()
    gate_q = Q.REGISTRY["rollup_quality_drift"].fn(spark, sf_dir).first()
    pq_app = Q.REGISTRY["ann_pq_append"].fn(spark, sf_dir).count()
    adv = Q.REGISTRY["layout_partition_advisor"].fn(spark, sf_dir).collect()
    adv_line = ", ".join(
        f"{r['table_name']}.{r['column_name']}={r['verdict']}"
        for r in sorted(adv, key=lambda r: (r["table_name"], r["column_name"]))[:4]
    )
    print(
        f"warehouse catalog: {n_art} artifacts, {stale} empty"
        f" | gates: ann={gate_ann['decision']}"
        f" (recall {gate_ann['recall_ppm_served']/10000:.0f}%)"
        f", lm={gate_lm['decision']}"
        f" (batch OOV {gate_lm['oov_bigram_ppm']/10000:.0f}%"
        f" -> served {gate_lm['served_oov_ppm']/10000:.0f}%)"
        f", quality={gate_q['decision']} (TV {gate_q['tv_ppm']/10000:.1f}%)"
    )
    print(
        f"PQ append serves top-5 from merged codes: {pq_app} rows"
        f" | partition advisor: {adv_line}"
    )
    print(f"total wall time: {time.perf_counter()-t0:.1f}s")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
