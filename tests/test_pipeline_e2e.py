"""Full pretraining-corpus pipeline, composed exactly as a user would:

    quality gate → exact dedup → near-dup drop → decontaminate
    → concat-chunk packing → deterministic sharded export

Each stage is individually oracle-verified elsewhere; THIS test pins
the composition invariants a production run is judged by: counts are
monotone, no eval leakage survives, packed spans respect the sequence
budget, export is reproducible, and the whole pipeline is
deterministic end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vectra_py_spark.operators import curation as cu
from vectra_py_spark.operators import dedup as dd
from vectra_py_spark.operators import packing as pk
from vectra_py_spark.operators import splits as sp
from vectra_py_spark.operators.export import export_shards

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier

SF_DIR = "/root/testdata/sf0.001"


def _survivors(spark, docs, eval_docs):
    """The pipeline through decontamination; returns the survivor df."""
    flags = cu.gopher_quality(docs)
    clean = docs.join(
        flags.filter("pass_gopher").select("doc_id"), "doc_id", "left_semi"
    )
    keep = dd.exact_dedup(clean).select(F.col("keep_id").alias("doc_id"))
    d1 = clean.join(keep, "doc_id", "left_semi")
    pairs = dd.minhash_lsh_pairs(d1, threshold=0.5)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    d2 = d1.join(drop, "doc_id", "left_anti")
    cont = sp.decontaminate(d2, eval_docs, k=3, min_overlap=2)
    return d2.join(cont.select("doc_id"), "doc_id", "left_anti")


def test_pretraining_pipeline_end_to_end(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()
    # planted eval set: verbatim copies of corpus docs — decontamination
    # MUST remove their sources from the training survivors
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0).select(
        "doc_id", "text"
    )
    assert eval_docs.count() > 0

    flags = cu.gopher_quality(docs)
    clean = docs.join(
        flags.filter("pass_gopher").select("doc_id"), "doc_id", "left_semi"
    )
    n1 = clean.count()
    assert 0 < n1 <= n0

    keep = dd.exact_dedup(clean).select(F.col("keep_id").alias("doc_id"))
    d1 = clean.join(keep, "doc_id", "left_semi")
    n2 = d1.count()
    assert 0 < n2 <= n1

    pairs = dd.minhash_lsh_pairs(d1, threshold=0.5)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    d2 = d1.join(drop, "doc_id", "left_anti")
    n3 = d2.count()
    assert 0 < n3 <= n2

    cont = sp.decontaminate(d2, eval_docs, k=3, min_overlap=2)
    d3 = d2.join(cont.select("doc_id"), "doc_id", "left_anti")
    n4 = d3.count()
    assert 0 < n4 <= n3

    # leakage invariant: no survivor's text equals any eval text
    leaked = d3.join(
        eval_docs.select(F.col("text").alias("etext")),
        F.col("text") == F.col("etext"),
    ).count()
    assert leaked == 0

    # packing: spans within the sequence budget, end exclusive > start,
    # and every span's doc is a survivor (provenance)
    seqs = pk.concat_chunk(d3, seq_len=64)
    assert (
        seqs.filter(
            (F.col("end_tok") - F.col("start_tok") > 64)
            | (F.col("end_tok") <= F.col("start_tok"))
        ).count()
        == 0
    )
    span_docs = seqs.select("doc_id").distinct()
    assert span_docs.join(d3, "doc_id", "left_anti").count() == 0
    assert 0 < span_docs.count() <= n4

    # export is reproducible and complete
    m1 = export_shards(d3, str(tmp_path / "e1"), n_shards=4)
    m2 = export_shards(d3, str(tmp_path / "e2"), n_shards=4)
    assert m1 == m2
    assert m1["total_rows"] == n4
    exported = spark.read.parquet(str(tmp_path / "e1"))
    assert exported.count() == n4
    assert exported.select("doc_id").join(d3, "doc_id", "left_anti").count() == 0

    # whole-pipeline determinism: recomputing the survivor set from
    # scratch yields the identical id set
    again = _survivors(spark, docs, eval_docs)
    sym_diff = d3.select("doc_id").exceptAll(again.select("doc_id")).count() + \
        again.select("doc_id").exceptAll(d3.select("doc_id")).count()
    assert sym_diff == 0
