"""scribedb_spark — a PySpark-native analytics engine with the data-diff
capabilities of Decathlon/scribedb, rebuilt Spark-first.

The reference (read-only at /root/reference) compares two RDBMS result
sets by installing chained-MD5 aggregates server-side and walking the
ordered result in LIMIT/OFFSET chunks (reference main.py:216-247,
scribedb/base.py:156-159). This engine expresses the same semantics as
one declarative Spark plan: canonical row formatting -> fingerprints ->
chunk compare -> anti-join diff, plus a broad operator surface
(joins/aggs/windows/setops) and LLM-data-pipeline extensions
(dedup, similarity search, text analysis, streaming).

Public API:
    from scribedb_spark import get_spark, compare, CompareSpec
"""

from scribedb_spark.session import get_spark, scale_conf
from scribedb_spark.compare import (
    CompareResult,
    CompareSpec,
    column_fingerprints,
    column_fp_table,
    compare,
    merkle_drill,
    merkle_levels,
)
from scribedb_spark.sources import (
    read_csv,
    read_json,
    read_orc,
    read_jdbc_query,
    convert_to_parquet,
    write_bucketed,
    write_report,
    write_sharded,
)
from scribedb_spark.canonical import (
    canonical_row,
    fp_row_md5,
    fp_unordered,
    fp_chain,
    fp_keyed_chunks,
    fp_delta_update,
    keyed_chunk_id,
    FP_MOD,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "compare",
    "CompareSpec",
    "CompareResult",
    "canonical_row",
    "fp_row_md5",
    "fp_unordered",
    "fp_chain",
    "fp_keyed_chunks",
    "fp_delta_update",
    "keyed_chunk_id",
    "FP_MOD",
    "merkle_levels",
    "merkle_drill",
    "column_fingerprints",
    "column_fp_table",
    "read_csv",
    "read_json",
    "read_orc",
    "read_jdbc_query",
    "convert_to_parquet",
    "write_bucketed",
    "write_report",
    "write_sharded",
    "scale_conf",
]
