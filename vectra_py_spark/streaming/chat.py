"""Streaming conversation (SFT) ingest — the chat member of the
ingest-twin family (`streaming/media.py`, `streaming/documents.py`):
conversations arrive as JSONL drop files (one ``{"conv_id": ...,
"messages": [...]}`` object per line — the interchange shape SFT
corpora ship in), each micro-batch runs the batch
`operators/chat.py::parse_conversations` pass (same quarantine
contract), and the turn rows append to a parquet sink exactly once
per batch id via the checkpoint.

The sink is `validate_conversations` / `dedup_conversations` /
`conversation_stats`-shaped: run the validator or the transcript
dedup over it on any cadence — continuous SFT-corpus hygiene as a
drop directory, the same two-step shape as the video/subtitle loops.

Scale shape: line parsing and from_json are narrow; nothing shuffles
in the ingest path itself (validation shuffles happen downstream on
the sink, where they are re-runnable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = ["conversation_file_stream", "stream_conversation_turns"]


def conversation_file_stream(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """readStream over a JSONL drop directory → (conv_id STRING,
    messages) via the shared `operators/chat.py::jsonl_conversations`
    extraction — string ids because that is what ShareGPT/OASST dumps
    carry (numeric ids stringify losslessly); id-less/garbage lines
    get a synthetic ``_line_<hash>`` id whose payload then quarantines
    as a kind='error' row instead of vanishing. Batch `chat-curate`
    uses the same helper, so a line classifies identically on either
    path."""
    from vectra_py_spark.operators.chat import jsonl_conversations

    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(drop_dir)
    )
    return jsonl_conversations(lines)


def stream_conversation_turns(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous conversation ingest: each micro-batch runs the batch
    parser (same array-guard + quarantine semantics as
    `operators/chat.py::parse_conversations`) and appends
    (conv_id, turn_idx, role, content, kind) to a parquet sink.
    Exactly-once per batch id via the checkpoint; a crashed query
    never re-parses a completed batch."""
    from vectra_py_spark.operators.chat import parse_conversations

    turns = parse_conversations(stream_df)
    writer = (
        turns.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName("stream_conversation_turns")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
