"""Table maintenance: small-file compaction and sorted rewrite.

Streaming ingest and per-batch commits (``SparkVectorIndex.commit``,
micro-batch appends) accrete small Parquet files; at 100 TB a scan's
task count and NameNode/listing pressure are set by file count, not
bytes. Compaction rewrites a directory to ~``target_bytes`` files,
optionally sorted so downstream range/point filters get row-group
min/max pruning.

Safety model on plain Parquet (no table format): write to a sibling
temp dir, then atomically swap via two renames. A crash between the
renames leaves the original intact at the swap path; Delta/Iceberg's
OPTIMIZE replaces this dance with a metadata commit — noted for the
real deployment, same plan shape underneath.
"""

from __future__ import annotations

import math
import shutil
import uuid
from pathlib import Path

from pyspark.sql import SparkSession

__all__ = ["compact_parquet", "compact_index", "parquet_file_stats"]


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a Parquet directory."""
    files = [
        p for p in Path(path).rglob("*.parquet") if not p.name.startswith("_")
    ]
    return len(files), sum(p.stat().st_size for p in files)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_by: str | None = None,
) -> int:
    """Rewrite ``path`` to ``ceil(total/target_bytes)`` files; returns
    the new file count. ``sort_by`` additionally range-sorts the
    rewrite (one shuffle) so each output file covers a tight key range
    → row-group pruning on that key afterwards."""
    _, total = parquet_file_stats(path)
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    if sort_by is not None:
        out = df.repartitionByRange(n_files, sort_by).sortWithinPartitions(
            sort_by
        )
    else:
        out = df.coalesce(n_files)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    n, _ = parquet_file_stats(path)
    return n


def compact_index(
    spark: SparkSession,
    index_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Compact a bucket-partitioned items table (``_bucket=N`` layout,
    see :class:`~vectra_py_spark.index.SparkVectorIndex`) bucket by
    bucket — each directory is rewritten independently, so the
    partition layout and the ``_vectra_meta.json`` side-file are
    untouched and a failure affects at most one bucket. Per-commit DML
    accretes one file per touched bucket per commit; this is the
    OPTIMIZE step that folds them back down.

    Returns {files_before, files_after, buckets_compacted}.
    """
    root = Path(index_path)
    before_total, _ = parquet_file_stats(index_path)
    compacted = 0
    for bucket_dir in sorted(root.glob("_bucket=*")):
        if not bucket_dir.is_dir():
            continue
        n, _ = parquet_file_stats(str(bucket_dir))
        if n <= 1:
            continue  # already one file: nothing to fold
        compact_parquet(spark, str(bucket_dir), target_bytes=target_bytes)
        compacted += 1
    after_total, _ = parquet_file_stats(index_path)
    return {
        "files_before": before_total,
        "files_after": after_total,
        "buckets_compacted": compacted,
    }
