"""Fresh-process A/B harness — the one honest wall-clock protocol on
this shared host.

The r12 noise record (CLAUDE.md): seven identical-code sf0.1 bench
runs measured 144.6-198.6 s headline in one session — cross-round or
within-session wall comparisons under ~2x are not signal. What IS
signal: interleaved fresh-process runs of the two variants
(A,B,A,B,...) so both sample the same host-noise window, each in its
own JVM with no warm session caches, with medians compared. This
script codifies the /tmp/ab_*.py pattern used since round 8.

Usage:
    python scripts/ab_fresh.py [--runs N] [--sf DIR] [--warmup SNIPPET]
                               A_SNIPPET B_SNIPPET

Each snippet is Python executed in a FRESH subprocess with
``spark`` (session, shuffle_partitions=32), ``sf`` (the sf dir) and
``Q`` (scribedb_spark.queries, extensions loaded) in scope; the
optional --warmup snippet runs untimed first in the same process
(e.g. a first invocation that builds session caches, when the subject
is warm-path cost). Prints one JSON line with per-variant samples and
medians.

Example (the r13 subject — decision-served panel vs measurement):
    python scripts/ab_fresh.py --runs 3 --sf /root/testdata/sf0.1 \\
      --warmup 'Q.REGISTRY["rollup_gate_panel"].fn(spark, sf).collect()' \\
      'Q.REGISTRY["rollup_gate_panel"].fn(spark, sf).collect()' \\
      'import scribedb_spark.pipeline as P; P.gate_panel_compute(spark, sf).collect()'
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from scribedb_spark.session import get_spark
from scribedb_spark import queries as Q
Q.load_extensions()
spark = get_spark(app_name="ab-fresh", shuffle_partitions=32)
sf = {sf!r}
env = {{"spark": spark, "sf": sf, "Q": Q}}
warmup = {warmup!r}
if warmup:
    exec(compile(warmup, "<warmup>", "exec"), env)
t0 = time.perf_counter()
exec(compile({snippet!r}, "<ab>", "exec"), env)
print("AB_SECONDS", time.perf_counter() - t0, flush=True)
"""


def run_once(snippet: str, sf: str, warmup: str | None) -> float:
    code = CHILD.format(repo=REPO, sf=sf, warmup=warmup or "", snippet=snippet)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_SECONDS"):
            return float(line.split()[1])
    raise RuntimeError(
        f"child produced no timing: rc={out.returncode}\n"
        f"stdout tail: {out.stdout[-500:]}\nstderr tail: {out.stderr[-1500:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3, help="samples per variant")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--warmup",
        default=None,
        help="untimed snippet run first in each child (same process)",
    )
    ap.add_argument("a", help="variant A snippet")
    ap.add_argument("b", help="variant B snippet")
    args = ap.parse_args()

    samples: list[dict] = []
    for i in range(args.runs):
        # interleave so both variants sample the same noise window
        for name, snip in (("a", args.a), ("b", args.b)):
            s = run_once(snip, args.sf, args.warmup)
            samples.append({"variant": name, "round": i, "seconds": round(s, 3)})
            print(
                json.dumps(samples[-1]),
                file=sys.stderr,
                flush=True,
            )
    med = {
        v: round(
            statistics.median(
                s["seconds"] for s in samples if s["variant"] == v
            ),
            3,
        )
        for v in ("a", "b")
    }
    print(
        json.dumps(
            {
                "sf": args.sf,
                "runs": args.runs,
                "median_a": med["a"],
                "median_b": med["b"],
                "ratio_b_over_a": round(med["b"] / max(med["a"], 1e-9), 2),
                "samples": samples,
            }
        )
    )


if __name__ == "__main__":
    main()
