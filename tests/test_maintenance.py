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


def test_compact_index_preserves_layout_and_results(spark, tmp_path):
    import json as _json

    from vectra_py_spark.index import SparkVectorIndex
    from vectra_py_spark.sources.maintenance import compact_index

    path = str(tmp_path / "vidx")
    idx = SparkVectorIndex(spark, path, n_buckets=4)
    idx.create()
    from pyspark.sql import functions as F

    batch = (
        spark.range(64)
        .select(
            F.concat(F.lit("it"), F.col("id")).alias("id"),
            F.array(F.col("id").cast("double"), F.lit(1.0)).alias("vector"),
        )
        .repartition(8)
    )
    idx.merge_batch(batch)
    # simulate micro-batch accretion: append an extra small file into
    # each bucket directory (what per-batch streaming ingest produces;
    # at fixture scale AQE coalesces the merge to one file per bucket)
    from vectra_py_spark.index import ITEM_SCHEMA

    for b in range(4):
        extra = spark.createDataFrame(
            [(f"xtra{b}", [0.5, 0.5], 0.5**0.5, {})],
            ITEM_SCHEMA,
        )
        extra.coalesce(1).write.mode("append").parquet(
            f"{path}/_bucket={b}"
        )
    before_rows = sorted(
        (r["id"], r["norm"]) for r in idx.items(use_cache=False).collect()
    )
    n_before, _ = parquet_file_stats(path)

    report = compact_index(spark, path, target_bytes=64 * 1024 * 1024)
    assert report["files_before"] == n_before
    assert report["files_after"] < n_before
    assert report["buckets_compacted"] >= 1

    # bucket layout + pinned meta survive; results are bit-identical
    from pathlib import Path as _P

    assert (_P(path) / "_vectra_meta.json").exists()
    assert _json.loads((_P(path) / "_vectra_meta.json").read_text())[
        "n_buckets"
    ] == 4
    idx2 = SparkVectorIndex(spark, path)
    after_rows = sorted(
        (r["id"], r["norm"]) for r in idx2.items(use_cache=False).collect()
    )
    assert after_rows == before_rows
    # DML still works post-compaction (layout intact for the merge path)
    idx2.upsert_item({"id": "it0_0", "vector": [9.0, 9.0]})
    idx2.commit()
    assert idx2.get_item("it0_0").collect()[0]["vector"] == [9.0, 9.0]
