"""The reference's worked example (reference example.md:97-317),
re-run on this engine.

Scenario: ``t_test(a int, b int, c text)`` with 50 000 rows
(a = 1..50000, b = a+10, c = constant 52-char string), compared
against a copy, then against a copy with one mutated row
(``update t_test set c = <41-char prefix> where a = 50`` —
reference example.md:261-269).

The reference takes ~15 s for run 1 (3 chunks x 5 s calibrated
chunk time, example.md:245); this engine runs both comparisons in a
couple of Spark jobs. Run:

    python examples/reference_walkthrough.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import scribedb_spark as ssp

CONST_C = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def main() -> None:
    spark = ssp.get_spark(app_name="reference-walkthrough")
    spark.sparkContext.setLogLevel("ERROR")

    t_test = spark.range(1, 50_001).select(
        F.col("id").cast("int").alias("a"),
        (F.col("id") + 10).cast("int").alias("b"),
        F.lit(CONST_C).alias("c"),
    )

    # Run 1 — identical datasets (reference example.md:246-252)
    t0 = time.perf_counter()
    res = ssp.compare(t_test, t_test, ssp.CompareSpec(sort_keys=["a"]))
    print(
        f"run 1 (identical): equal={res.equal} "
        f"rows={res.src_rows}/{res.tgt_rows} in {time.perf_counter()-t0:.2f}s"
    )

    # Run 2 — one mutated row (reference example.md:261-317)
    mutated = t_test.withColumn(
        "c", F.when(F.col("a") == 50, F.lit(CONST_C[:41])).otherwise(F.col("c"))
    )
    t0 = time.perf_counter()
    res2 = ssp.compare(
        t_test, mutated, ssp.CompareSpec(sort_keys=["a"], keys=["a"])
    )
    print(
        f"run 2 (1 mutated row): equal={res2.equal} "
        f"diff_count={res2.diff_count} in {time.perf_counter()-t0:.2f}s"
    )
    for r in res2.diff.orderBy("side").collect():
        print(f"  {r['side']}: a={r['a']}, b={r['b']}, c={r['c'][:20]}...")

    # chunk localization (the reference's per-chunk OK/NOK console,
    # reference main.py:229-247)
    from scribedb_spark.compare import chunk_fingerprints

    chunks = chunk_fingerprints(
        t_test, mutated, ssp.CompareSpec(sort_keys=["a"], bucket_rows=20_758)
    )
    print("chunk report (bucket = 20758, the reference's calibrated size):")
    for r in chunks.collect():
        print(
            f"  chunk {r['chunk_id']}: {r['status']} "
            f"({r['src_rows']} vs {r['tgt_rows']} rows)"
        )

    # merkle drill-down: locate the mutated chunk with log-depth
    # probes instead of scanning every chunk hash
    drill = ssp.merkle_drill(
        t_test, mutated, ["a", "b", "c"], ["a"], bucket_rows=1000
    )
    print("merkle drill (fanout 16, 1000-row chunks):")
    for r in drill.collect():
        print(f"  differing chunk {r['chunk_id']}: {r['h_src']} != {r['h_tgt']}")

    # column drill: WHICH attribute carries the mutation — one
    # aggregate pass per side, no row fetch (CLI: --mode colfp)
    colfp = ssp.column_fingerprints(t_test, mutated, ["a"])
    bad_cols = [r["col_name"] for r in colfp.collect() if not r["equal"]]
    print(f"column drill: mutated column(s) = {bad_cols}")

    # incremental recheck (beyond the reference): keyed-chunk
    # fingerprints maintained in O(delta), no rescan of unchanged rows
    t0 = time.perf_counter()
    base_fps = ssp.fp_keyed_chunks(t_test, "a", n_chunks=32)
    old_img = t_test.filter(F.col("a") == 50)
    new_img = mutated.filter(F.col("a") == 50)
    maintained = ssp.fp_delta_update(base_fps, old_img, new_img, "a", n_chunks=32)
    scratch = ssp.fp_keyed_chunks(mutated, "a", n_chunks=32)
    drift = (
        maintained.alias("m")
        .join(scratch.alias("s"), "chunk_id")
        .filter(F.col("m.fp_sum") != F.col("s.fp_sum"))
        .count()
    )
    print(
        f"incremental fp maintenance: 1-row delta folded, "
        f"{drift} chunks drift vs from-scratch (expect 0) "
        f"in {time.perf_counter()-t0:.2f}s"
    )

    try:
        res2.raise_on_diff()
    except ValueError as e:
        print(f"verdict: {e}")  # 'Datasets are different.' — ref main.py:263-267


if __name__ == "__main__":
    main()
