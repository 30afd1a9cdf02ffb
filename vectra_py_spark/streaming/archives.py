"""Continuous packed-corpus ingestion: the streaming twin of
``sources/documents.py::read_archive_documents``. A pipeline keeps
dropping TAR/ZIP bundles of documents into a directory (the supported
shape for millions of small files — one listing over archives, not
members); each micro-batch explodes NEW archives through the exact
batch walker (``explode_archives_df``) and extracts members through
the exact batch dispatcher (``archive_documents``) — the
streaming-twin discipline: one parser per format, equivalence-tested
— appending (uri, text, doc_type) rows exactly-once per batch id.
Corrupt archives quarantine in-stream (the explode emits error rows;
extraction drops them), never a failed query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

__all__ = ["archive_file_stream", "stream_archive_documents"]


def archive_file_stream(
    spark: SparkSession,
    drop_dir: str,
    pattern: str = "*",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over an archive drop directory → streaming
    (path, content) frame; one archive per row, archives are the
    parallelism unit."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(
            "path STRING, modificationTime TIMESTAMP, "
            "length LONG, content BINARY"
        )
        .option("pathGlobFilter", pattern)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(drop_dir).select("path", "content")


def stream_archive_documents(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    min_chars: int = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the explode+extract stream: append-only parquet corpus,
    exactly-once per batch id — a re-run after a crash never re-walks
    a completed archive."""
    from vectra_py_spark.sources.documents import archive_documents
    from vectra_py_spark.sources.warc import explode_archives_df

    docs = archive_documents(
        explode_archives_df(stream_df), min_chars=min_chars
    )
    writer = (
        docs.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName("stream_archive_documents")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
