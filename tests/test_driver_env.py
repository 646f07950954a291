"""Driver-environment mirror (the hard gate's actual setup).

The correctness driver builds its OWN vanilla SparkSession — no UTC
pin, no Arrow flag, no legacy-parquet conf, default 200 shuffle
partitions — and runs the first ~50 enumerated keys. Round 1 lost 7
keys to exactly this gap (events TIMESTAMP(NANOS) under a session
without the nanosAsLong conf). This test reproduces that environment
in a SUBPROCESS (a second SparkContext cannot exist in-process) and
smoke-runs the driver's whole key budget.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMOKE = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

# deliberately NOT scribedb_spark.session.get_spark: mirror the
# driver's bare builder (plus a non-UTC timezone, harsher than the
# driver's default, to prove table()'s read-time UTC pin holds)
spark = (
    SparkSession.builder.appName("driver-mirror")
    .master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

# the WHOLE registry, not just this round's ~50-key budget: the
# self-advancing enumeration rotates new keys into the budget each
# round, so every key must already survive the driver's session
qs = e.queries()
failed = []
for k in qs:
    try:
        qs[k](spark, %(sf)r).count()
    except Exception as ex:  # noqa: BLE001
        failed.append((k, repr(ex)[:200]))
print("CHECKED", len(qs))
for k, err in failed:
    print("FAILED", k, err)
sys.exit(1 if failed else 0)
"""


def test_registry_runs_under_vanilla_session(sf_dir):
    code = SMOKE % {"repo": REPO, "sf": sf_dir}
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    assert "CHECKED" in out, out[-2000:]
    n = int(out.split("CHECKED", 1)[1].split()[0])
    assert n >= 131, out[-2000:]
    assert proc.returncode == 0, out[-2000:]
