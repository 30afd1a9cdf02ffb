"""Unit semantics for splits/sampling/decontamination operators
(`vectra_py_spark.operators.splits`) — the cross-engine oracle parity
itself is covered by `test_entry_oracle.py` (train_split,
stratified_sample, decontaminate entries)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from vectra_py_spark.operators import splits as sp
import pytest


def _py_bucket(i) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % sp.N_BUCKETS


def test_hash_bucket_matches_python_md5(spark):
    ids = [0, 1, 41, 499, 2**40 + 7]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = dict(
        df.withColumn("b", sp.hash_bucket(F.col("doc_id")))
        .select("doc_id", "b")
        .collect()
    )
    assert got == {i: _py_bucket(i) for i in ids}


def test_assign_splits_fractions_and_stability(spark):
    n = 4000
    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(n)], "doc_id long, lang string"
    )
    out = sp.assign_splits(df).collect()
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in out:
        expected = (
            "train" if r["bucket"] < 800 else "val" if r["bucket"] < 900 else "test"
        )
        assert r["split"] == expected
        assert r["bucket"] == _py_bucket(r["doc_id"])
        counts[r["split"]] += 1
    # md5 buckets are near-uniform: 80/10/10 ± a few points at n=4000
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02
    # stability: the assignment of an id is independent of the rest of
    # the dataset (the reason hash-split beats rand() for backfills)
    sub = sp.assign_splits(df.filter(F.col("doc_id") < 100)).collect()
    full = {r["doc_id"]: r["split"] for r in out}
    assert all(full[r["doc_id"]] == r["split"] for r in sub)


def test_stratified_sample_respects_per_stratum_cuts(spark):
    n = 3000
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(n)],
        "doc_id long, lang string",
    )
    out = sp.stratified_sample(df, {"en": 300, "de": 500}, default_cut=200)
    rows = out.collect()
    cut = {"en": 300, "de": 500, "fr": 200}
    for r in rows:
        assert r["bucket"] == _py_bucket(r["doc_id"])
        assert r["bucket"] < cut[r["lang"]]
    # every qualifying row is kept (deterministic, not probabilistic)
    expected = sum(1 for i in range(n) if _py_bucket(i) < cut[["en", "de", "fr"][i % 3]])
    assert len(rows) == expected


def test_decontaminate_counts_distinct_shared_shingles(spark):
    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # shares "the quick brown" and "quick brown fox" → n_overlap=2
            (1, "the quick brown fox sleeps"),
            # shares one 3-gram only → below min_overlap=2
            (2, "a lazy dog saw the quick brown cat"),
            # no overlap
            (3, "entirely different words here"),
            # duplicate shingles in doc must count once (distinct)
            (4, "the quick brown fox jumps the quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["contamination"])
        for r in sp.decontaminate(corpus, eval_docs, k=3, min_overlap=2).collect()
    }
    assert set(got) == {1, 4}
    assert got[1][0] == 2
    # doc 4: 5 distinct shingles, 3 of them eval shingles — repeats
    # count once
    assert got[4] == (3, round(3 / 5, 6))


@pytest.mark.slow
def test_bloom_decontaminate_matches_exact_and_prunes(spark):
    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta token{i} epsilon zeta eta theta")
            for i in range(40)
        ]
        + [(100, "alpha beta gamma delta shared phrase in both sets")],
        "doc_id long, text string",
    )
    is_eval = F.col("doc_id") % 7 == 0
    corpus, eval_docs = docs.filter(~is_eval), docs.filter(is_eval)
    exact = {
        (r["doc_id"], r["n_overlap"], r["contamination"])
        for r in sp.decontaminate(
            corpus, eval_docs, k=3, min_overlap=1
        ).collect()
    }
    bloom = {
        (r["doc_id"], r["n_overlap"], r["contamination"])
        for r in sp.bloom_decontaminate(
            corpus, eval_docs, k=3, min_overlap=1
        ).collect()
    }
    assert bloom == exact and len(bloom) > 0


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_bloom_membership_has_no_false_negatives(spark):
    # every eval shingle must pass its own bitmap (Bloom guarantee);
    # a disjoint probe set should be mostly rejected (prefilter prunes)
    eval_docs = spark.createDataFrame(
        [(i, f"common prefix words unique{i} suffix tail") for i in range(20)],
        "doc_id long, text string",
    )
    from vectra_py_spark.operators.dedup import shingle_df

    eval_sh = shingle_df(eval_docs, k=3).select("shingle").distinct()
    pos_rows = eval_sh.selectExpr(
        "explode(array("
        + ", ".join(sp._bloom_pos_sql(i) for i in range(sp.BLOOM_K))
        + ")) AS pos"
    ).distinct().collect()
    words = [0] * (sp.BLOOM_M_BITS // 64)
    for r in pos_rows:
        p = int(r["pos"])
        words[p >> 6] |= 1 << (p & 63)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bloom_row = spark.createDataFrame([(words,)], "bloom: array<bigint>")
    self_pass = (
        eval_sh.crossJoin(F.broadcast(bloom_row))
        .filter(F.expr(sp.bloom_membership_expr()))
        .count()
    )
    assert self_pass == eval_sh.count()  # zero false negatives
    probe = spark.createDataFrame(
        [(i, f"totally different vocabulary item{i} goes here now") for i in range(50)],
        "doc_id long, text string",
    )
    probe_sh = shingle_df(probe, k=3).select("shingle").distinct()
    fp_pass = (
        probe_sh.crossJoin(F.broadcast(bloom_row))
        .filter(F.expr(sp.bloom_membership_expr()))
        .count()
    )
    assert fp_pass < probe_sh.count() * 0.1  # sparse bitmap prunes hard
