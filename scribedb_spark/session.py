"""SparkSession construction with scale-oriented defaults.

Local testing runs on local[N] (single JVM), but every config here is
chosen for the 1000-executor / 100 TB case and merely *also* behaves
well locally:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and dynamic join-strategy switch replace the reference's empirical
  "bucket size" calibration (reference scribedb/base.py:108-154) —
  Spark measures actual partition sizes instead of timing probe
  queries.
- session timezone pinned to UTC so timestamp canonicalization
  (canonical.py) is deterministic across drivers/executors — the
  reference pins Oracle's NLS_TIMESTAMP_FORMAT per session for the
  same reason (reference scribedb/oracle.py:140-145).
- Arrow enabled for the few pandas-UDF paths (vectorized batch
  transfer, not row-at-a-time pickling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scribedb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master``/``shuffle_partitions`` default from the
    ``SPARK_GRAFT_CPUS`` env var (driver contract) so tests, bench and
    the driver harness all share one code path.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Driver test data writes TIMESTAMP(NANOS) parquet, which Spark
        # rejects by default (PARQUET_TYPE_ILLEGAL); read as long and
        # convert in sources.table() (ns -> us truncation matches
        # DuckDB's own read of the same files).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Small local test data: don't let tiny files explode into
        # thousands of splits; at cluster scale this would be tuned to
        # HDFS/object-store block size (128-256 MB).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
