"""Deterministic sharded export: balance, reproducibility, manifest."""

from __future__ import annotations

from vectra_py_spark.operators.export import export_shards


def test_export_shards_balanced_and_deterministic(spark, tmp_path):
    df = spark.range(1, 2001).selectExpr("id AS doc_id", "repeat('x', 5) AS text")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_shards(df, p1, n_shards=8)
    m2 = export_shards(df, p2, n_shards=8)
    assert m1["total_rows"] == 2000 and m1 == m2
    # hash balance: every shard within ±40% of the mean
    sizes = list(m1["shards"].values())
    assert len(sizes) == 8
    assert min(sizes) > 0.6 * 250 and max(sizes) < 1.4 * 250
    # membership + intra-shard order reproducible across reruns
    a = spark.read.parquet(p1 + "/shard=3").collect()
    b = spark.read.parquet(p2 + "/shard=3").collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    # a different salt reshuffles membership
    m3 = export_shards(df, str(tmp_path / "c"), n_shards=8, salt="export:v2")
    c = spark.read.parquet(str(tmp_path / "c") + "/shard=3").collect()
    assert {r.doc_id for r in c} != {r.doc_id for r in a}
