"""Small-file compaction (`vectra_py_spark.sources.maintenance`)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from vectra_py_spark.sources.maintenance import (
    compact_parquet,
    parquet_file_stats,
)


def _fragmented_table(spark, path, n_parts=40):
    spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    ).repartition(n_parts).write.mode("overwrite").parquet(path)


def test_compaction_reduces_file_count_preserves_rows(spark):
    path = tempfile.mkdtemp() + "/t"
    _fragmented_table(spark, path)
    n_before, total = parquet_file_stats(path)
    assert n_before == 40
    n_after = compact_parquet(spark, path, target_bytes=total)
    assert n_after == 1
    df = spark.read.parquet(path)
    assert df.count() == 20_000
    assert df.agg(F.sum("id")).first()[0] == 20_000 * 19_999 // 2


def test_sorted_compaction_enables_rowgroup_pruning_ranges(spark):
    path = tempfile.mkdtemp() + "/t"
    _fragmented_table(spark, path)
    _, total = parquet_file_stats(path)
    n_after = compact_parquet(
        spark, path, target_bytes=max(1, total // 4), sort_by="id"
    )
    assert n_after >= 2
    # range-partitioned rewrite: per-file id ranges must not overlap
    import pyarrow.parquet as pq
    from pathlib import Path

    ranges = []
    for p in Path(path).rglob("*.parquet"):
        if p.name.startswith("_"):
            continue
        md = pq.read_metadata(p)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (ranges,)
    assert spark.read.parquet(path).count() == 20_000
