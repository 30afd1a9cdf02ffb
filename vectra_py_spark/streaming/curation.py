"""Streaming twin of the batch ``clean_corpus`` curation pipeline.

The three text signals (quality floor, repetition flag, language gate)
are STATELESS per-row expressions — they run unchanged inside a
micro-batch with zero streaming state. The only stateful leg of the
batch pipeline is dedup survivorship, which
:func:`vectra_py_spark.streaming.dedup.streaming_exact_dedup` already
provides across micro-batches (first-seen id wins; the batch operator's
min-id survivor coincides when arrival order follows ids).

This composition is the live-ingest curation front door: filter junk
BEFORE the stateful operator so the dedup state only holds keys that
could ever be emitted — state size tracks the CLEAN corpus, not the
crawl volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vectra_py_spark.operators.text_analysis import (
    is_repetitive_col,
    pred_lang_col,
    quality_score_col,
)
from vectra_py_spark.streaming.dedup import streaming_exact_dedup

__all__ = ["streaming_clean_corpus"]


def streaming_clean_corpus(
    stream_df: DataFrame,
    quality_min: float = 0.5,
    lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """readStream df with (id, text) → append-mode stream of
    ``(text_hash, doc_id, n_seen)`` for documents that pass the quality
    floor, repetition filter, and language gate AND are the first-ever
    arrival of their content."""
    filtered = stream_df.filter(
        (quality_score_col(text_col) >= quality_min)
        & (is_repetitive_col(text_col) == 0)
        & (pred_lang_col(text_col) == lang)
    )
    return streaming_exact_dedup(filtered, id_col=id_col, text_col=text_col)
