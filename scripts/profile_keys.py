"""Per-key phase profiler (optimization round 15).

For each named key, splits wall time into:
  - build_s: Python-side DataFrame construction (fn(spark, sf) return)
  - exec1_s: first .count() (includes planning + execution + AQE)
  - exec2_s: second .count() on a FRESH fn() call (steady-state measure,
    the thing bench.py's best-of-k converges to)

Also counts Exchange / Subquery / BatchEvalPython occurrences in the
formatted plan so plan shape and wall can be read side by side.

Usage:
  python scripts/profile_keys.py key1 key2 ...       # explicit keys
  python scripts/profile_keys.py --top 25            # top-N from BENCH_DETAIL.json
Output: one JSON line per key on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from scribedb_spark import queries as Q
    from scribedb_spark.session import get_spark
    from scribedb_spark.sources import load_tables

    args = sys.argv[1:]
    Q.load_extensions()
    if args and args[0] == "--top":
        n = int(args[1])
        detail = json.load(
            open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_DETAIL.json"))
        )
        keys = [k for k, _ in sorted(detail["queries"].items(), key=lambda kv: -kv[1])[:n]]
    else:
        keys = args

    spark = get_spark(app_name="profile-keys")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, SF_DIR).values():
        df.count()

    for key in keys:
        fn = Q.REGISTRY[key].fn
        spark.sparkContext.setJobDescription(f"profile:{key}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        df2 = fn(spark, SF_DIR)
        t3 = time.perf_counter()
        df2.count()
        t4 = time.perf_counter()
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df2.explain("formatted")
        plan = buf.getvalue()
        rec = {
            "key": key,
            "build_s": round(t1 - t0, 3),
            "exec1_s": round(t2 - t1, 3),
            "build2_s": round(t3 - t2, 3),
            "exec2_s": round(t4 - t3, 3),
            "n_exchange": plan.count("Exchange"),
            "n_subquery": plan.count("Subquery"),
            "n_python": plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("MapInArrow"),
        }
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
