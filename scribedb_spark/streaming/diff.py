"""Incremental (streaming) dataset diff — the compare core applied to
a stream via foreachBatch (SURVEY.md §2.10 "incremental diff as
foreachBatch over the batch compare core").

Each micro-batch of incoming rows is compared against the reference
dataset restricted to the batch's key range; per-batch verdicts
accumulate in a driver-side list (tests) or a sink table (production).
This is the streaming analog of the reference's chunk loop
(reference main.py:216-247): a chunk == a micro-batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from scribedb_spark.compare import CompareSpec, compare


@dataclass
class StreamDiffResult:
    batches: list = field(default_factory=list)

    @property
    def total_diff(self) -> int:
        return sum(b["diff_count"] for b in self.batches)


def stream_compare(
    stream_df: DataFrame,
    reference_df: DataFrame,
    keys: list[str],
    spec: CompareSpec | None = None,
    query_name: str = "stream_diff",
) -> tuple:
    """Start a foreachBatch comparison of ``stream_df`` against
    ``reference_df``. Returns (query, result_accumulator).

    Each batch joins (semi) the reference down to the keys present in
    the batch, then runs the full batch compare — so per-batch cost is
    proportional to batch size, not reference size (the semi-join
    prunes; with a partitioned reference, partition pruning applies).
    """
    spec = spec or CompareSpec()
    acc = StreamDiffResult()

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        ref_slice = reference_df.join(
            batch_df.select(*keys).distinct(), on=keys, how="left_semi"
        )
        res = compare(ref_slice, batch_df.select(*reference_df.columns), spec)
        acc.batches.append(
            {
                "batch_id": batch_id,
                "equal": res.equal,
                "src_rows": res.src_rows,
                "tgt_rows": res.tgt_rows,
                "diff_count": res.diff_count,
            }
        )

    q = (
        stream_df.writeStream.foreachBatch(per_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    return q, acc
