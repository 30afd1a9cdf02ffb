"""Streaming BM25 index maintenance — the continuous twin of
:func:`vectra_py_spark.operators.ranking.bm25_append_index`.

Each micro-batch runs one incremental index job: the arriving
documents' postings land in their own ``(bucket, _batch_id)``
partitions and a per-batch ``(n_docs, sum_dl)`` stats-delta row lands
in the side store, both via dynamic partition overwrite keyed on the
micro-batch epoch id — so the crash-before-checkpoint-commit replay
Structured Streaming performs replaces a batch's own partitions
instead of double-counting postings or tokens. A
:func:`~vectra_py_spark.operators.ranking.bm25_probe` issued at any
point serves exact scores over everything ingested so far (the stats
read sums the delta rows; integer accumulators, no drift).

Why ``foreachBatch``: index maintenance is a write job with its own
layout discipline (bucket repartition, dynamic overwrite, a second
side-store write) — not a streaming aggregation. ``foreachBatch``
gives each micro-batch the full batch planner and transactional
batch-id bookkeeping; this is the same shape as the vector-index
ingest loop (``streaming/ingest.py``) and the near-dup store loop
(``streaming/incremental_dedup.py``).

Batch ids are offset by +1 so a :func:`bm25_write_index` bootstrap
(which owns ``_batch_id = 0``) composes with a subsequent stream over
the same index path. Starting a NEW checkpoint over an existing
index replays epoch ids from 0 and would overwrite earlier stream
batches — same single-writer/single-checkpoint discipline as every
store in ``streaming/``.

100 TB notes: per-batch cost is O(batch postings) — the corpus is
never rescanned; many small batches accrue one parquet file per
touched (bucket, batch) directory, so compact on a schedule with
``sources/maintenance.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from vectra_py_spark.operators.ranking import (
    BM25_INDEX_BUCKETS,
    bm25_append_index,
)

__all__ = ["stream_bm25_index"]


def stream_bm25_index(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = BM25_INDEX_BUCKETS,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the index-maintenance loop over a document stream.

    ``available_now=True`` drains what's there and stops (incremental
    backfill); ``False`` runs continuously. Works against an empty
    path (pure-streaming index) or one bootstrapped by
    ``bm25_write_index``.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bm25_append_index(
            batch_df,
            index_path,
            id_col=id_col,
            text_col=text_col,
            n_buckets=n_buckets,
            batch_id=batch_id + 1,
        )

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
