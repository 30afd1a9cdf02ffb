"""Partition-scoped MERGE (`SparkVectorIndex._merge`) — VERDICT r1 #2.

The whole point: a commit touches ONLY the bucket directories containing
staged or deleted ids. Untouched partition files must remain
byte-identical (never rewritten, never even opened for write), emptied
buckets must disappear, and the id→bucket map must be pinned across
reopens.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.index import BUCKET_COL, SparkVectorIndex


def _snapshot(path: str) -> dict[str, dict[str, str]]:
    """{bucket_dir: {filename: sha256}} for every parquet part file."""
    out: dict[str, dict[str, str]] = {}
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if not (entry.startswith(f"{BUCKET_COL}=") and os.path.isdir(full)):
            continue
        files = {}
        for fn in os.listdir(full):
            if fn.endswith(".parquet"):
                with open(os.path.join(full, fn), "rb") as f:
                    files[fn] = hashlib.sha256(f.read()).hexdigest()
        out[entry] = files
    return out


def _bucket_of(spark, item_id: str, n_buckets: int) -> int:
    return (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(item_id)), F.lit(n_buckets)).cast("int")
        )
        .head()[0]
    )


@pytest.fixture
def idx(spark, tmp_path):
    ix = SparkVectorIndex(spark, str(tmp_path / "idx"), vector_dim=2, n_buckets=8)
    ix.create()
    for i in range(32):
        ix.insert_item({"id": f"k{i:02d}", "vector": [float(i), 1.0]})
    ix.commit()
    return ix


class TestPartitionScopedMerge:
    def test_upsert_rewrites_only_touched_bucket(self, spark, idx):
        before = _snapshot(idx.path)
        assert len(before) > 1, "fixture must span several buckets"
        idx.upsert_item({"id": "k00", "vector": [99.0, 99.0]})
        idx.commit()
        after = _snapshot(idx.path)
        touched = f"{BUCKET_COL}={_bucket_of(spark, 'k00', 8)}"
        assert after[touched] != before[touched]
        for d in before:
            if d != touched:
                assert after[d] == before[d], f"untouched {d} was rewritten"
        row = idx.get_item("k00").head()
        assert row.vector == [99.0, 99.0]
        assert idx.items().count() == 32

    def test_delete_rewrites_only_touched_bucket(self, spark, idx):
        before = _snapshot(idx.path)
        idx.delete_item("k01")
        idx.commit()
        after = _snapshot(idx.path)
        touched = f"{BUCKET_COL}={_bucket_of(spark, 'k01', 8)}"
        for d in before:
            if d != touched:
                assert after[d] == before[d]
        assert idx.items().count() == 31
        assert idx.get_item("k01").count() == 0

    def test_emptied_bucket_dir_is_removed(self, spark, idx):
        # delete every id in one bucket → its directory must disappear
        target = _bucket_of(spark, "k00", 8)
        doomed = [
            r.id
            for r in idx._raw_items()
            .filter(F.col(BUCKET_COL) == target)
            .select("id")
            .collect()
        ]
        for i in doomed:
            idx.delete_item(i)
        idx.commit()
        assert f"{BUCKET_COL}={target}" not in _snapshot(idx.path)
        assert idx.items().count() == 32 - len(doomed)

    def test_delete_where_predicate(self, idx):
        idx.delete_where(F.col("id") < F.lit("k10"))
        assert idx.items().count() == 22
        # no-match predicate is a no-op (no buckets touched, no write job)
        before = _snapshot(idx.path)
        idx.delete_where(F.col("id") == F.lit("zzz"))
        assert _snapshot(idx.path) == before

    def test_merge_read_is_partition_pruned(self, spark, idx):
        plan = (
            idx._raw_items()
            .filter(F.col(BUCKET_COL).isin(3))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters" in plan and f"{BUCKET_COL}#" in plan

    def test_n_buckets_pinned_across_reopen(self, spark, idx):
        # reopening with a DIFFERENT default must adopt the pinned layout,
        # or the same id would hash to two different directories
        re = SparkVectorIndex(spark, idx.path, vector_dim=2, n_buckets=999)
        re.upsert_item({"id": "k00", "vector": [5.0, 5.0]})
        re.commit()
        assert re.n_buckets == 8
        assert re.items().count() == 32  # replaced in place, not duplicated
        assert re.get_item("k00").head().vector == [5.0, 5.0]

    def test_insert_duplicate_still_rejected(self, idx):
        idx.insert_item({"id": "k05", "vector": [1.0, 2.0]})
        with pytest.raises(ValueError, match="already exists"):
            idx.commit()
        idx.cancel_update()

    def test_dim_mismatch_still_rejected(self, idx):
        with pytest.raises(ValueError, match="dim"):
            idx.insert_item({"id": "new", "vector": [1.0, 2.0, 3.0]})

    def test_merge_batch_delete_cond_single_merge(self, spark, idx):
        staged = spark.createDataFrame(
            [("n1", [7.0, 7.0]), ("n2", [8.0, 8.0])], "id string, vector array<double>"
        )
        idx.merge_batch(staged, delete_cond=F.col("id").isin("k02", "k03"))
        ids = {r.id for r in idx.items().select("id").collect()}
        assert {"n1", "n2"} <= ids and not {"k02", "k03"} & ids
        assert len(ids) == 32
