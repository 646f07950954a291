"""Fresh-process skew A/B (the /tmp/ab_*.py pattern): a planted
30%-hot-key equi-join at 64x sf0.1 fact scale (MULT * 600k = 38.4M
fact rows), one variant per process, printing ONE JSON line:

  unsalted  plain shuffle join, AQE skew split OFF -> the straggler
  salted    operators/skew.py salted_join (16-way), AQE skew OFF
  aqe       plain join with Spark's own AQE skew split ON

Auto-broadcast is disabled in all arms (the dim is the medium-sized
case salting exists for). Row count + checksum prove the three arms
compute the identical join; wall + max task runtime (REST API) show
where the time goes.

    python scripts/ab_skew.py {unsalted|salted|aqe}
"""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

variant = sys.argv[1]
MULT = 64
BASE_ROWS = 600_000  # ~lineitem rows at sf0.1
N = MULT * BASE_ROWS
DIM = 100_000
HOT_PCT = 30

from pyspark.sql import functions as F  # noqa: E402

from scribedb_spark.operators.skew import salted_join  # noqa: E402
from scribedb_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name=f"skew-ab-{variant}",
    extra_conf={
        "spark.ui.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": (
            "true" if variant == "aqe" else "false"
        ),
    },
)
spark.sparkContext.setLogLevel("ERROR")

fact = spark.range(N).select(
    F.when(F.col("id") % 100 < HOT_PCT, F.lit(0))
    .otherwise(F.pmod(F.xxhash64("id"), F.lit(DIM)))
    .alias("key"),
    F.col("id").alias("val"),
)
dim = spark.range(DIM).select(
    F.col("id").alias("key"), (F.col("id") * 7).alias("dim_val")
)

t0 = time.perf_counter()
if variant == "salted":
    j = salted_join(fact, dim, "key")
else:
    j = fact.join(dim, "key")
row = j.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.col("val") + F.col("dim_val")).alias("chk"),
).collect()[0]
wall = time.perf_counter() - t0

# Per-stage task-runtime distributions: the straggler signal is the
# max/median ratio WITHIN the stage that owns the hot reduce task
# (local[32]'s 31 idle threads absorb the straggler in wall time; a
# 1000-partition cluster would not).
app_id = spark.sparkContext.applicationId
base = f"http://localhost:4040/api/v1/applications/{app_id}"
straggler = {"max_ms": -1, "p50_ms": -1, "ratio": -1.0, "n_tasks": 0}
try:
    stages = json.load(
        urllib.request.urlopen(f"{base}/stages?status=complete")
    )
    best = None
    for st in stages:
        tl = json.load(
            urllib.request.urlopen(
                f"{base}/stages/{st['stageId']}/{st['attemptId']}"
                "/taskList?length=5000"
            )
        )
        durs = sorted(int(t.get("duration", 0)) for t in tl)
        if not durs:
            continue
        mx, med = durs[-1], durs[len(durs) // 2]
        if best is None or mx > best[0]:
            best = (mx, med, len(durs))
    if best:
        straggler = {
            "max_ms": best[0],
            "p50_ms": best[1],
            "ratio": round(best[0] / max(best[1], 1), 2),
            "n_tasks": best[2],
        }
except Exception as e:  # pragma: no cover - diagnostics only
    print(f"# rest scrape failed: {e}", file=sys.stderr)

print(
    json.dumps(
        {
            "key": "join_skew_ab",
            "variant": variant,
            "mult": MULT,
            "fact_rows": N,
            "dim_rows": DIM,
            "hot_pct": HOT_PCT,
            "rows": int(row["n"]),
            "checksum": int(row["chk"]) % (2**61 - 1),
            "wall_s": round(wall, 2),
            "straggler_stage_max_ms": straggler["max_ms"],
            "straggler_stage_p50_ms": straggler["p50_ms"],
            "straggler_ratio": straggler["ratio"],
            "straggler_stage_tasks": straggler["n_tasks"],
        }
    )
)
spark.stop()
