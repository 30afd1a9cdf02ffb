"""Structured Streaming operators over event streams.

The reference has no streaming surface (SURVEY.md §1.1); this package
adds the stream-shaped operators a production event pipeline needs,
written so the SAME logical transformations run in batch (testable,
oracle-checkable) and as a ``readStream`` plan (watermarks + windowed
state).
"""

from vectra_py_spark.streaming.asof import streaming_asof_enrich
from vectra_py_spark.streaming.bm25_ingest import stream_bm25_index
from vectra_py_spark.streaming.documents import (
    document_file_stream,
    stream_documents,
)
from vectra_py_spark.streaming.events import (
    event_time_col,
    sessionize,
    streaming_windowed_counts,
    windowed_counts,
)
from vectra_py_spark.streaming.incremental_dedup import stream_neardup_dedup
from vectra_py_spark.streaming.kmeans import stream_kmeans
from vectra_py_spark.streaming.ingest import stream_upsert
from vectra_py_spark.streaming.joins import streaming_interval_join
from vectra_py_spark.streaming.media import (
    media_file_stream,
    stream_media_features,
)

__all__ = [
    "media_file_stream",
    "stream_media_features",
    "document_file_stream",
    "stream_documents",
    "streaming_asof_enrich",
    "event_time_col",
    "sessionize",
    "streaming_windowed_counts",
    "windowed_counts",
    "stream_upsert",
    "stream_bm25_index",
    "stream_neardup_dedup",
    "stream_kmeans",
    "streaming_interval_join",
]
