"""Bucketed Parquet tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders,
events ⋈ sessions) is shuffling both sides on the key. Spark's table
bucketing pre-shuffles ONCE at write time: both tables hash-partitioned
into the same number of buckets on the join key mean every subsequent
join/groupBy on that key reads co-located buckets and skips the
exchange entirely (`.explain` shows SortMergeJoin with no
ShuffleExchange input — asserted in `tests/test_bucketed.py`).

This is the Parquet-era stand-in for the reference's single-file
locality (everything in one process's memory,
`/root/reference/README.md:11`): locality by layout, planned once at
ingest, exploited by every downstream query.

Bucket-count guidance at scale: pick `n_buckets` so one bucket of the
LARGER table ≈ 100–200 MB (fits an executor core's scan batch);
both sides MUST use the same count for exchange elision. Bucket
pruning (`spark.sql.sources.bucketing.enabled`, on by default) also
serves point lookups on the key: only 1/n_buckets files scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) Parquet table.

    Sorting within buckets lets SortMergeJoin skip its sort too —
    the join degenerates to a zip of pre-sorted co-located files.
    """
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` would lose it — bucketing info lives
    in the catalog, not the files)."""
    return spark.table(table)
