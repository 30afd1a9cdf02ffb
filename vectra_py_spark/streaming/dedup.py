"""Stateful streaming dedup — a custom operator on
``applyInPandasWithState``.

The batch dedup family (:mod:`vectra_py_spark.operators.dedup`) answers
"which documents are duplicates" over a static corpus. On a live ingest
stream the question becomes "is this document NEW" — which needs state
that survives across micro-batches. Spark's built-in
``dropDuplicates`` covers exact keys; this module keeps the operator
custom (per the reference-extension brief) so the state schema can
carry provenance (first-seen id, count) and the same shape extends to
near-dup keys (SimHash bucket, MinHash band) by changing the grouping
column.

Semantics: group the stream by a content key (default ``md5(text)``);
the FIRST row of a key ever seen is emitted, every later row (same
micro-batch or any later one) is dropped while the running duplicate
count accumulates in state.

Scale: state is one small row per distinct key, partitioned by the
shuffle on the grouping key; the state store is RocksDB-backed on a
real cluster and bounded with a TTL timeout when the dedup horizon is
finite (e.g. 30-day crawl windows).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_exact_dedup", "DEDUP_OUTPUT_SCHEMA", "DEDUP_STATE_SCHEMA"]

DEDUP_OUTPUT_SCHEMA = "text_hash string, doc_id string, n_seen bigint"
DEDUP_STATE_SCHEMA = "first_doc_id string, n_seen bigint"


def _dedup_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the first-ever row per key; count the rest in state."""
    seen_before = state.exists
    first_doc: Any = state.get[0] if seen_before else None
    n_seen: int = state.get[1] if seen_before else 0

    emit = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        if first_doc is None:
            first = pdf.iloc[0]
            first_doc = str(first["doc_id"])
            emit = pd.DataFrame(
                {
                    "text_hash": [key[0]],
                    "doc_id": [first_doc],
                    "n_seen": [0],
                }
            )
        n_seen += len(pdf)
    state.update((first_doc, n_seen))
    if emit is not None:
        yield emit


def streaming_exact_dedup(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: one output row per never-before-seen text.

    Input: any streaming DataFrame with an id and a text column.
    Output (append mode): ``(text_hash, doc_id, n_seen)`` where doc_id
    is the first document to carry that content.
    """
    keyed = stream_df.select(
        F.md5(F.col(text_col)).alias("text_hash"),
        F.col(id_col).cast("string").alias("doc_id"),
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
