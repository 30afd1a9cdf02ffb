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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pack_sequences",
    "packing_invariants",
    "packing_invariants_sql",
    "length_bucketed_batches",
    "length_bucketed_batches_sql",
    "concat_chunk",
    "concat_chunk_sql",
]

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
    sort: bool = True,
) -> DataFrame:
    """(group, doc_id, n_tokens, n_used, seq_id, offset) — one row per
    document; ``seq_id`` is the packed sequence within the group and
    ``offset`` the document's token start inside it.

    Deterministic: FFD order is (n_used DESC, doc_id ASC) per group;
    bins are scanned in creation order, so reruns produce identical
    assignments regardless of physical partitioning.

    ``sort=False`` skips the final presentation sort (a global range
    exchange) — downstream aggregations like
    :func:`packing_invariants` re-cluster on ``grp`` anyway, and the
    ``applyInPandas`` shuffle already colocates each group.
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

    packed = counted.groupBy("grp").applyInPandas(pack, schema=PACKED_SCHEMA)
    if sort:
        packed = packed.orderBy("grp", "seq_id", "offset")
    return packed


def packing_invariants(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-group invariant summary of a :func:`pack_sequences` result —
    the SQL-checkable shadow of the non-SQL FFD assignment.

    FFD's bin choice cannot be expressed relationally, but these CAN,
    and a correct packing must satisfy all of them:

    - ``n_docs`` / ``total_used``: every document is placed exactly
      once and token mass is conserved (``Σ min(n_tokens, budget)``) —
      both exactly predictable from the input corpus alone.
    - ``budget_ok``: no sequence exceeds the token budget.
    - ``offsets_ok``: within each sequence, documents tile densely from
      offset 0 with no gaps or overlaps (offset == previous end).
    - ``seqs_ok``: sequence ids are dense 0..n_seqs-1 per group.

    The driver compares this frame to a pure-SQL oracle that predicts
    the counts and asserts the three booleans true — a wrong FFD (lost
    doc, over-full bin, overlapping offsets, skipped seq id) flips a
    cell and hash-mismatches.
    """
    w = Window.partitionBy("grp", "seq_id").orderBy("offset", "doc_id")
    prev_end = F.lag(F.col("offset") + F.col("n_used"), 1, 0).over(w)
    per_seq = (
        packed.withColumn(
            "dense", (F.col("offset") == prev_end).cast("int")
        )
        .groupBy("grp", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs_seq"),
            F.sum("n_used").alias("fill"),
            F.min("dense").alias("dense_ok"),
        )
    )
    return (
        per_seq.groupBy("grp")
        .agg(
            F.sum("n_docs_seq").cast("bigint").alias("n_docs"),
            F.sum("fill").cast("bigint").alias("total_used"),
            (F.max("fill") <= budget).alias("budget_ok"),
            (F.min("dense_ok") == 1).alias("offsets_ok"),
            (
                (F.min("seq_id") == 0)
                & (F.max("seq_id") == F.count(F.lit(1)) - 1)
            ).alias("seqs_ok"),
        )
        .orderBy("grp")
    )


def packing_invariants_sql(
    budget: int = 512,
    table: str = "documents",
    group_col: str = "source",
    text_expr: str = "text",
) -> str:
    """DuckDB oracle for :func:`packing_invariants`: predicts the
    conservation counts straight from the corpus (mirroring
    :func:`pack_sequences`' whitespace tokenization) and pins the
    structural booleans to true."""
    n = rf"len(string_split_regex({text_expr}, '\s+'))"
    return f"""
        SELECT CAST({group_col} AS VARCHAR) AS grp,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEAST({n}, {budget})) AS BIGINT) AS total_used,
               true AS budget_ok,
               true AS offsets_ok,
               true AS seqs_ok
        FROM {table}
        GROUP BY 1
        ORDER BY 1
    """


def length_bucketed_batches(
    df: DataFrame,
    bucket_width: int = 64,
    batch_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-batch padding efficiency of length-bucketed inference
    batching: docs group into token-length buckets, each bucket splits
    into fixed-size batches in id order, and every batch reports how
    much compute padding-to-max wastes. The standard serving-side
    answer to "sort by length or burn FLOPs on pad tokens".

    Output: (bucket, batch_id, n_docs, max_tokens, total_tokens,
    pad_frac) — ``pad_frac = 1 − total/(n_docs·max)``.

    100 TB design: token counts are a narrow projection; the only
    exchange is the hash shuffle on bucket for the ``row_number``
    window, and batches aggregate in place (the window and the groupBy
    share the bucket partitioning, so Catalyst reuses one Exchange).
    Bucket count is bounded by max_len/width — no skew surprise: a hot
    bucket is just a longer partition, and the window is O(n) in it.
    """
    n_tokens = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
        )
    )
    bucket = (
        ((n_tokens + F.lit(bucket_width - 1)) / bucket_width)
        .cast("bigint")
        .alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    staged = (
        df.select(F.col(id_col), n_tokens.alias("n_tokens"), bucket)
        .withColumn(
            "batch_id",
            ((F.row_number().over(w) - 1) / batch_size).cast("bigint"),
        )
    )
    return (
        staged.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                1.0
                - F.sum("n_tokens")
                / (F.count(F.lit(1)) * F.max("n_tokens")),
                6,
            ).alias("pad_frac"),
        )
        .orderBy("bucket", "batch_id")
    )


def length_bucketed_batches_sql(
    bucket_width: int = 64, batch_size: int = 8, table: str = "documents",
    id_col: str = "doc_id", text_expr: str = "text",
) -> str:
    n = (
        rf"len(list_filter(string_split_regex(lower({text_expr}), '\s+'),"
        rf" x -> x <> ''))"
    )
    return f"""
        WITH staged AS (
            SELECT {id_col}, {n} AS n_tokens,
                   CAST(ceil({n} * 1.0 / {bucket_width}) AS BIGINT) AS bucket
            FROM {table}
        ),
        batched AS (
            SELECT *,
                   CAST(floor((ROW_NUMBER() OVER
                       (PARTITION BY bucket ORDER BY {id_col}) - 1)
                       * 1.0 / {batch_size}) AS BIGINT) AS batch_id
            FROM staged
        )
        SELECT bucket, batch_id, COUNT(*) AS n_docs,
               MAX(n_tokens) AS max_tokens,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(1.0 - SUM(n_tokens) * 1.0
                     / (COUNT(*) * MAX(n_tokens)), 6) AS pad_frac
        FROM batched
        GROUP BY bucket, batch_id
        ORDER BY bucket, batch_id
    """


def concat_chunk(
    df: DataFrame,
    seq_len: int = 512,
    shard_size: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style concat-and-chunk sharding: the corpus concatenated in
    id order and cut every ``seq_len`` tokens; each output row maps one
    document's token span into one training sequence —
    (doc_id, seq_id, start_tok, end_tok) with end exclusive, token
    offsets document-local. A doc crossing a cut emits one row per
    sequence it touches.

    100 TB design: the global prefix sum runs as the classic two-phase
    scan, not one serial window — (1) a window partitioned by
    ``shard = id DIV shard_size`` computes shard-local running sums in
    parallel, (2) shard TOTALS (|corpus|/shard_size rows) get their own
    tiny running-sum window and broadcast back as offsets. The serial
    stage touches shard counts only. The span explode is a narrow map
    (``sequence(first_seq, last_seq)`` — bounded by doc length /
    seq_len).
    """
    n_tokens = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
        )
    )
    shard = (F.col(id_col) / shard_size).cast("bigint").alias("shard")
    staged = df.select(
        F.col(id_col), n_tokens.alias("n"), shard
    ).filter(F.col("n") > 0)

    w_local = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = staged.withColumn(
        "local_before", F.coalesce(F.sum("n").over(w_local), F.lit(0))
    )
    shard_tot = staged.groupBy("shard").agg(F.sum("n").alias("sn"))
    w_shard = (
        Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = shard_tot.select(
        "shard",
        F.coalesce(F.sum("sn").over(w_shard), F.lit(0)).alias("shard_off"),
    )
    cum = (
        local.join(F.broadcast(offsets), "shard")
        .withColumn("before", F.col("shard_off") + F.col("local_before"))
    )
    first_seq = F.expr(f"before DIV {seq_len}")
    last_seq = F.expr(f"(before + n - 1) DIV {seq_len}")
    spans = cum.select(
        id_col,
        "n",
        "before",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    start = F.greatest(
        F.col("seq_id") * seq_len - F.col("before"), F.lit(0)
    )
    end = F.least(
        (F.col("seq_id") + 1) * seq_len - F.col("before"), F.col("n")
    )
    return (
        spans.select(
            id_col,
            "seq_id",
            start.cast("bigint").alias("start_tok"),
            end.cast("bigint").alias("end_tok"),
        )
        .orderBy(id_col, "seq_id")
    )


def concat_chunk_sql(
    seq_len: int = 512, table: str = "documents",
    id_col: str = "doc_id", text_expr: str = "text",
) -> str:
    n = (
        rf"len(list_filter(string_split_regex(lower({text_expr}), '\s+'),"
        rf" x -> x <> ''))"
    )
    return f"""
        WITH staged AS (
            SELECT {id_col}, {n} AS n FROM {table} WHERE {n} > 0
        ),
        cum AS (
            SELECT {id_col}, n,
                   CAST(COALESCE(SUM(n) OVER (ORDER BY {id_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS before
            FROM staged
        ),
        spans AS (
            SELECT {id_col}, n, before, u.seq_id
            FROM cum,
                 LATERAL unnest(range(before // {seq_len},
                                      (before + n - 1) // {seq_len} + 1))
                     AS u(seq_id)
        )
        SELECT {id_col}, CAST(seq_id AS BIGINT) AS seq_id,
               CAST(GREATEST(seq_id * {seq_len} - before, 0) AS BIGINT)
                   AS start_tok,
               CAST(LEAST((seq_id + 1) * {seq_len} - before, n) AS BIGINT)
                   AS end_tok
        FROM spans
        ORDER BY {id_col}, seq_id
    """
