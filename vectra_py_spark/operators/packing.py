"""Sequence packing: fit documents into fixed token-budget training
sequences (first-fit-decreasing bin packing + intra-sequence offsets).

North-star training-pipeline operator (no reference analog): packed
pretraining batches waste ``1 − fill`` of every accelerator step, so
the pipeline packs documents into ``budget``-token sequences ahead of
time. Differs from :func:`~vectra_py_spark.embeddings.token_budget_batch_ids`
(the reference's A6 greedy *batching*, one running batch per group):
packing keeps MANY bins open and places each document into the first
bin with room — the classic FFD heuristic (≤ 11/9·OPT + 1 bins).

Spark-first design: token counting is JVM-side; only the inherently
sequential FFD scan runs in Python, per group via ``applyInPandas`` —
groups pack independently, so parallelism = group cardinality (at
100 TB: group = ingest shard/day; skewed groups split by a salt column
first). Shuffle carries (group, id, n_tokens) only — never text.
Documents longer than the budget are truncated to exactly one full
sequence (``n_used = min(n_tokens, budget)``), the standard choice.

Not SQL-expressible (FFD is stateful over an ordered scan with an
unbounded open-bin set) → rows-only driver check + property tests,
same gating as the splitter pipeline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]

PACKED_SCHEMA = (
    "grp string, doc_id bigint, n_tokens int, n_used int, "
    "seq_id int, offset int"
)


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, doc_id, n_tokens, n_used, seq_id, offset) — one row per
    document; ``seq_id`` is the packed sequence within the group and
    ``offset`` the document's token start inside it.

    Deterministic: FFD order is (n_used DESC, doc_id ASC) per group;
    bins are scanned in creation order, so reruns produce identical
    assignments regardless of physical partitioning.
    """
    counted = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), r"\s+")).cast("int").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["n_used"] = pdf["n_tokens"].clip(upper=budget)
        pdf = pdf.sort_values(
            ["n_used", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        remaining: list[int] = []  # per-bin tokens left, index = seq_id
        seq_ids, offsets = [], []
        for used in pdf["n_used"]:
            used = int(used)
            for b, room in enumerate(remaining):
                if used <= room:
                    seq_ids.append(b)
                    offsets.append(budget - room)
                    remaining[b] = room - used
                    break
            else:
                seq_ids.append(len(remaining))
                offsets.append(0)
                remaining.append(budget - used)
        pdf["seq_id"] = seq_ids
        pdf["offset"] = offsets
        return pdf[["grp", "doc_id", "n_tokens", "n_used", "seq_id", "offset"]]

    return (
        counted.groupBy("grp")
        .applyInPandas(pack, schema=PACKED_SCHEMA)
        .orderBy("grp", "seq_id", "offset")
    )
