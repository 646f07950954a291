"""CLI (reference scribedb/command_line.py surface, made functional).

    python -m scribedb_spark.cli -f compare.yaml
                                 [--mode hash|full|remote-hybrid|remote-keyed|merkle]
                                 [--search-diff] [-l LOGLEVEL]

The reference parsed ``--search_diff`` and never used it (reference
scribedb/command_line.py:7-48, SURVEY.md §2.11); here it controls
whether differing rows are materialized (full) or only the verdict +
chunk report (hash). Exit code 1 on difference, mirroring the
reference's raised ValueError (reference main.py:263-267).
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="scribedb-spark")
    p.add_argument("-f", "--file", required=True, help="YAML compare spec")
    p.add_argument(
        "--mode",
        choices=[
            "hash",
            "full",
            "remote-hybrid",
            "remote-keyed",
            "remote-colfp",
            "merkle",
            "colfp",
            "iblt",
        ],
        default="full",
        help="hash: verdict+chunk report only; full: also materialize "
        "diff rows; remote-hybrid: one side is a `type: dbapi` source "
        "hashed inside the remote database (32 hex chars per chunk "
        "over the wire), compared to the Spark side's fp_chain; "
        "merkle: root-first tree compare printing only differing "
        "chunks (sparse-diff fast path); colfp: per-column "
        "fingerprints — report WHICH attributes diverge, no row fetch; "
        "iblt: constant-size sketch reconciliation — exact differing "
        "keys (added/removed/changed) from one ~256 KB exchange",
    )
    p.add_argument(
        "-s",
        "--search-diff",
        action="store_true",
        help="print differing rows (the reference parsed this flag but ignored it)",
    )
    p.add_argument(
        "-a",
        "--attribute",
        action="store_true",
        help="with spec keys: print per-key change class + the exact "
        "differing columns (added/removed/changed[cols])",
    )
    p.add_argument(
        "-o",
        "--out",
        default=None,
        help="write the machine-readable reports (diff/, chunks/, "
        "changed_cols/) as parquet under this directory",
    )
    p.add_argument("-l", "--loglevel", default="WARN")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from scribedb_spark.config import load_config, run_compare_config
    from scribedb_spark.session import get_spark

    cfg = load_config(args.file)
    spark = get_spark(app_name="scribedb-compare")
    spark.sparkContext.setLogLevel(args.loglevel)

    import time

    t0 = time.monotonic()
    if args.mode == "remote-hybrid":
        # reference's headline WAN scenario (reference example.md:
        # 205-252): per-chunk OK/NOK, zero data rows over the wire
        from scribedb_spark.config import run_hybrid_config

        report = run_hybrid_config(spark, cfg)
        n = len(report)
        for i, r in enumerate(report, 1):
            ms = int((time.monotonic() - t0) * 1000)
            fp = (
                r["remote_fp"]
                if r["status"] == "OK"
                else f"{r['remote_fp']}!={r['local_fp']}"
            )
            print(f"{i}/{n} {r['status']} {fp} ({ms} ms) {100 * i // n}%")
        if all(r["status"] == "OK" for r in report):
            print("Datasets are identicals")  # the reference's wording
            return 0
        print("Datasets are different.")
        return 1
    if args.mode == "remote-keyed":
        # order-free twin of remote-hybrid: one remote aggregation,
        # chunking by key hash — no ORDER BY, no count preflight
        from scribedb_spark.config import run_keyed_hybrid_config

        report = run_keyed_hybrid_config(spark, cfg)
        n = len(report)
        for i, r in enumerate(report, 1):
            ms = int((time.monotonic() - t0) * 1000)
            fp = (
                r["remote_fp"]
                if r["status"] == "OK"
                else f"{r['remote_fp']}!={r['local_fp']}"
            )
            print(f"{i}/{n} {r['status']} {fp} ({ms} ms) {100 * i // n}%")
        if all(r["status"] == "OK" for r in report):
            print("Datasets are identicals")  # the reference's wording
            return 0
        print("Datasets are different.")
        return 1
    if args.mode == "remote-colfp":
        # WAN column drill: |cols| * 8 bytes over the wire, one
        # remote aggregation round trip
        from scribedb_spark.config import run_colfp_hybrid_config

        report = run_colfp_hybrid_config(spark, cfg)
        bad = [r for r in report if r["status"] != "OK"]
        for r in report:
            mark = (
                "OK"
                if r["status"] == "OK"
                else f"NOK {r['remote_fp']}!={r['local_fp']}"
            )
            print(f"col {r['col_name']} {mark}")
        if not bad:
            print("Datasets are identicals")  # the reference's wording
            return 0
        print(f"Datasets are different. ({len(bad)} columns)")
        return 1
    if args.mode == "colfp":
        from scribedb_spark.config import run_colfp_config

        rows = run_colfp_config(spark, cfg).collect()
        bad = [r for r in rows if not r["equal"]]
        for r in rows:
            mark = "OK" if r["equal"] else f"NOK {r['src_fp']}!={r['tgt_fp']}"
            print(f"col {r['col_name']} {mark}")
        if not bad:
            print("Datasets are identicals")  # the reference's wording
            return 0
        print(f"Datasets are different. ({len(bad)} columns)")
        return 1
    if args.mode == "iblt":
        from scribedb_spark.config import run_iblt_config

        rows = run_iblt_config(spark, cfg).collect()
        for r in rows:
            print(f"key {r[0]} {r['change']}")
        if not rows:
            print("Datasets are identicals")  # the reference's wording
            return 0
        print(f"Datasets are different. ({len(rows)} keys)")
        return 1
    if args.mode == "merkle":
        from scribedb_spark.config import run_merkle_config

        drill = run_merkle_config(spark, cfg)
        rows = drill.collect()
        for r in rows:
            print(
                f"chunk {r['chunk_id']} NOK {r['h_src']}!={r['h_tgt']}"
            )
        if not rows:
            print("Datasets are identicals")  # the reference's wording
            return 0
        print(f"Datasets are different. ({len(rows)} chunks)")
        return 1
    res = run_compare_config(spark, cfg, with_chunks=(args.mode == "hash"))
    if res.chunk_status is not None:
        # per-chunk report, the reference's console UX (reference
        # main.py:229-247): i/n OK|NOK hash (ms) pct% — ms is elapsed
        # since the compare started (chunks hash in ONE Spark job
        # here, not N sequential round-trips)
        chunks = res.chunk_status.collect()
        n = len(chunks)
        for i, r in enumerate(chunks, 1):
            ms = int((time.monotonic() - t0) * 1000)
            fp = r["src_fp"] if r["status"] == "OK" else f"{r['src_fp']}!={r['tgt_fp']}"
            print(f"{i}/{n} {r['status']} {fp} ({ms} ms) {100 * i // n}%")
    print(
        f"rows: src={res.src_rows} tgt={res.tgt_rows} "
        f"diff={res.diff_count} equal={res.equal}"
    )
    if not res.equal and (args.search_diff or args.mode == "full"):
        for r in res.diff.collect():
            side = r["side"]
            vals = [f"{k}={r[k]}" for k in res.diff.columns if k != "side"]
            print(f"{side}: " + ", ".join(vals))
    if args.out:
        # persisted reports are what the next run diffs against
        # (fingerprint_delta) and what audits read — console output is
        # for humans, parquet is the machine interface
        from scribedb_spark.sources import write_report

        write_report(res.diff, f"{args.out}/diff")
        if res.chunk_status is not None:
            write_report(res.chunk_status, f"{args.out}/chunks")
        if res.changed_cols is not None:
            write_report(res.changed_cols, f"{args.out}/changed_cols")
    if args.attribute and res.changed_cols is not None:
        keys = [c for c in res.changed_cols.columns if c not in ("change", "changed_cols")]
        for r in res.changed_cols.collect():
            kv = ", ".join(f"{k}={r[k]}" for k in keys)
            suffix = f" [{r['changed_cols']}]" if r["changed_cols"] else ""
            print(f"{r['change']}: {kv}{suffix}")
    if res.equal:
        print("Datasets are identicals")  # the reference's wording
        return 0
    print("Datasets are different.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
