"""Streaming ingest into SparkVectorIndex
(`vectra_py_spark.streaming.ingest` + `SparkVectorIndex.merge_batch`)."""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectra_py_spark.index import SparkVectorIndex
from vectra_py_spark.streaming.ingest import stream_upsert

ITEM_JSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("vector", T.ArrayType(T.DoubleType())),
        T.StructField(
            "metadata", T.MapType(T.StringType(), T.StringType())
        ),
    ]
)


def _drop_file(drop_dir: str, name: str, items: list[dict]) -> None:
    p = Path(drop_dir) / name
    p.write_text("\n".join(json.dumps(i) for i in items))


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_merge_batch_bulk_upsert_and_checks(spark):
    base = tempfile.mkdtemp()
    idx = SparkVectorIndex(spark, f"{base}/idx", vector_dim=2)
    idx.create()
    idx.merge_batch(
        spark.createDataFrame(
            [("a", [1.0, 0.0], {"s": "x"}), ("b", [0.0, 1.0], None)],
            ITEM_JSON_SCHEMA,
        )
    )
    assert idx.get_index_stats()["items"] == 2
    # upsert replaces, norm recomputed
    idx.merge_batch(
        spark.createDataFrame([("b", [0.0, 3.0], None)], ITEM_JSON_SCHEMA)
    )
    row = idx.get_item("b").collect()[0]
    assert row["vector"] == [0.0, 3.0] and row["norm"] == 3.0
    assert idx.get_index_stats()["items"] == 2
    with pytest.raises(ValueError, match="duplicate id"):
        idx.merge_batch(
            spark.createDataFrame(
                [("c", [1.0, 1.0], None), ("c", [2.0, 2.0], None)],
                ITEM_JSON_SCHEMA,
            )
        )
    with pytest.raises(ValueError, match="dimension"):
        idx.merge_batch(
            spark.createDataFrame([("d", [1.0, 2.0, 3.0], None)], ITEM_JSON_SCHEMA)
        )


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_stream_upsert_drains_drop_dir_incrementally(spark):
    base = tempfile.mkdtemp()
    drop, ckpt = f"{base}/drop", f"{base}/ckpt"
    Path(drop).mkdir()
    idx = SparkVectorIndex(spark, f"{base}/idx", vector_dim=2)
    idx.create()

    _drop_file(drop, "b0.json", [
        {"id": "a", "vector": [1.0, 0.0], "metadata": {"k": "1"}},
        {"id": "b", "vector": [0.0, 1.0], "metadata": {"k": "2"}},
    ])
    stream = spark.readStream.schema(ITEM_JSON_SCHEMA).json(drop)
    q = stream_upsert(idx, stream, ckpt)
    q.awaitTermination(120)
    assert idx.get_index_stats()["items"] == 2

    # second drop: one new item, one update — checkpoint must skip b0.json
    _drop_file(drop, "b1.json", [
        {"id": "c", "vector": [1.0, 1.0], "metadata": None},
        {"id": "a", "vector": [2.0, 0.0], "metadata": {"k": "9"}},
    ])
    stream = spark.readStream.schema(ITEM_JSON_SCHEMA).json(drop)
    q = stream_upsert(idx, stream, ckpt)
    q.awaitTermination(120)
    assert idx.get_index_stats()["items"] == 3
    a = idx.get_item("a").collect()[0]
    assert a["vector"] == [2.0, 0.0] and a["metadata"]["k"] == "9"
    # top-k still works over the streamed index
    top = idx.query_items([1.0, 0.0], top_k=1).collect()
    assert top[0]["id"] == "a"


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_stream_bm25_index_matches_batch_build(spark, tmp_path):
    """Two drained streaming drops build the same servable index as a
    one-shot batch build over the union; draining again with no new
    data changes nothing."""
    from vectra_py_spark.operators import ranking as rk
    from vectra_py_spark.streaming.bm25_ingest import stream_bm25_index

    rows1 = [(1, "spark shuffle spark join"),
             (2, "spark table column row filter")]
    rows2 = [(3, "table column row filter group"),
             (4, "shuffle exchange partition skew shuffle")]
    cols = "doc_id bigint, text string"
    src = str(tmp_path / "src")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    def _drop_and_drain(rows):
        if rows:
            spark.createDataFrame(rows, cols).write.mode("append").parquet(src)
        stream = spark.readStream.schema(cols).parquet(src)
        q = stream_bm25_index(stream, idx, ckpt)
        q.awaitTermination(120)

    _drop_and_drain(rows1)
    _drop_and_drain(rows2)

    full = str(tmp_path / "full_idx")
    rk.bm25_write_index(
        spark.createDataFrame(rows1 + rows2, cols), full
    )
    terms = ["spark", "shuffle"]
    got = [(r.doc_id, r.bm25)
           for r in rk.bm25_probe(spark, idx, terms, k=4).collect()]
    want = [(r.doc_id, r.bm25)
            for r in rk.bm25_probe(spark, full, terms, k=4).collect()]
    assert got == want

    _drop_and_drain([])  # empty drain: no state change
    again = [(r.doc_id, r.bm25)
             for r in rk.bm25_probe(spark, idx, terms, k=4).collect()]
    assert again == want
