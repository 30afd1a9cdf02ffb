"""Streaming near-dup ingest dedup against a persistent fingerprint
store — the continuous twin of
:func:`vectra_py_spark.operators.dedup.incremental_dedup`.

Every micro-batch is one batch incremental-dedup job: the arriving docs
check against (a) the fingerprint store accumulated from all PREVIOUS
batches and (b) earlier rows of the same batch; survivors land in the
sink AND their fingerprints append to the store, so the loop stays
incremental — each batch scans fingerprints (8 bytes/doc), never the
historical corpus text.

Why ``foreachBatch`` and not ``applyInPandasWithState``: a Hamming-ball
match needs the pigeonhole banding join (a doc probes ``radius+1``
block keys), and banding + the drop decision is a two-stage aggregation
— more than one stateful operator per streaming query is where
Structured Streaming's state composition ends. ``foreachBatch`` gets
the full batch planner per micro-batch (the SAME equi-join plan the
batch operator uses, AQE included), and the store-append is the state,
checkpointed by batch id for exactly-once. This is also the shape that
swaps Parquet for Delta on a production deployment.

100 TB notes: the store is append-only (one small file per batch —
compact with `sources/maintenance.py` on a schedule); the banding join
cost per batch is |batch|-driven. A block-partitioned store layout
(partitionBy(block_val), cf. `minhash_write_index`) turns each probe
into a pruned scan when batches are much smaller than the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectra_py_spark.operators.dedup import incremental_dedup_against_store

__all__ = ["stream_neardup_dedup"]

_STORE_SCHEMA = "doc_id BIGINT, simhash16 BIGINT"


def _read_store(spark, store_path: str) -> DataFrame:
    try:
        return spark.read.schema(_STORE_SCHEMA).parquet(store_path)
    except Exception:
        return spark.createDataFrame([], _STORE_SCHEMA)


def stream_neardup_dedup(
    stream_df: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_dir: str,
    radius: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the dedup-ingest loop: surviving docs append to
    ``out_path``; their fingerprints append to ``store_path``.

    The store holds (doc_id, simhash16) only. Batches replay
    exactly-once via the checkpoint; a replayed batch re-appends its
    survivors' fingerprints, which is harmless (dup fingerprints only
    add candidates that verify to the same drop decisions).
    """
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        store = _read_store(spark, store_path)
        # corpus side needs (id, fp) only: feed the banding join with a
        # fingerprint-shaped frame; text is only needed for NEW docs
        survivors = incremental_dedup_against_store(
            store, batch_df, radius=radius, id_col=id_col, text_col=text_col
        ).cache()
        try:
            (
                batch_df.join(
                    survivors.select(F.col(id_col).alias("__sid")),
                    batch_df[id_col] == F.col("__sid"),
                    "left_semi",
                ).write.mode("append").parquet(out_path)
            )
            survivors.select(id_col, "simhash16").write.mode("append").parquet(
                store_path
            )
        finally:
            survivors.unpersist()

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("stream_neardup_dedup")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
