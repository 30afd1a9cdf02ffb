"""Continuous WARC ingestion: a crawl keeps dropping .warc/.warc.gz
segments into a directory; the stream explodes each new archive into
records with the SAME parser and row schema as the batch reader
(``sources/warc.py::explode_warc`` — the streaming-twin discipline) and
appends to a parquet record store, exactly-once per batch id. Corrupt
archives land as quarantine rows in-stream, never a failed query.

From the record store, the existing batch operators take over: media
payloads → probe/features, HTML → markdown documents → index ingest.
Scale: ``binaryFile`` streaming lists new files per trigger; archives
are the parallelism unit, records never enter a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectra_py_spark.sources.warc import explode_warc

__all__ = ["warc_file_stream", "stream_warc_records"]


def warc_file_stream(
    spark: SparkSession,
    drop_dir: str,
    pattern: str = "*.warc*",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a WARC drop directory → streaming
    (path, content) frame ready for :func:`explode_warc`."""
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


def stream_warc_records(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the record-explode stream: each micro-batch runs the batch
    explode (same parser, same schema incl. the quarantine ``error``
    column) and appends to a parquet sink. Exactly-once per batch id
    via the checkpoint; a re-run after a crash never re-parses a
    completed archive."""
    records = explode_warc(stream_df.select(F.col("path"), F.col("content")))
    writer = (
        records.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName("stream_warc_records")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
