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


def stream_fp_maintain(
    stream_df: DataFrame,
    base_fps: DataFrame,
    key: str,
    cols: list[str] | None = None,
    n_chunks: int = 64,
    query_name: str = "stream_fp",
) -> tuple:
    """Start a foreachBatch sink that MAINTAINS a keyed-chunk
    fingerprint table from an INSERT stream: every micro-batch folds
    into the running table via canonical.fp_delta_update (old_rows
    empty — append-only ingest), so after any prefix of batches the
    table equals a from-scratch fp_keyed_chunks over base + all rows
    seen, at O(|batch|) per batch. This is the streaming half of the
    incremental-recheck story: a CDC/ingest stream keeps the local
    fingerprint artifact current, and keyed_hybrid_compare(local_fps=…)
    verifies it against the remote side in one aggregation round trip
    whenever a check is due.

    Returns (query, holder) where ``holder.fps`` is the maintained
    DataFrame (localCheckpoint'd per batch so the lineage stays flat
    across many batches instead of growing one union per batch).
    """
    from scribedb_spark.canonical import fp_delta_update

    class _Holder:
        fps = base_fps.localCheckpoint()

    holder = _Holder()
    empty = stream_df.sparkSession.createDataFrame([], stream_df.schema)

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.localCheckpoint()  # pin: the source view is transient
        if not rows.take(1):
            return
        holder.fps = fp_delta_update(
            holder.fps, empty, rows, key, cols, n_chunks
        ).localCheckpoint()

    q = (
        stream_df.writeStream.foreachBatch(per_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    return q, holder
