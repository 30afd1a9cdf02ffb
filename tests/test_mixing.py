"""Unit semantics for deterministic epoch mixing
(`vectra_py_spark.operators.mixing`) — cross-engine parity is covered
by `test_entry_oracle.py` (epoch_mix entry)."""

from __future__ import annotations

import pytest

import hashlib

from vectra_py_spark.operators.mixing import _SALT, epoch_mix
from vectra_py_spark.operators.splits import N_BUCKETS


def _bucket(i) -> int:
    s = f"{i}{_SALT}".encode()
    return int(hashlib.md5(s).hexdigest()[:4], 16) % N_BUCKETS


def test_epoch_mix_copy_counts_exact(spark):
    n = 2000
    df = spark.createDataFrame(
        [(i, ["en", "zh", "fr"][i % 3]) for i in range(n)],
        "doc_id long, lang string",
    )
    out = epoch_mix(df, {"en": 0.5, "zh": 2.5}, default_epochs=1.0)
    rows = out.collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_idx"])
    for i in range(n):
        lang = ["en", "zh", "fr"][i % 3]
        base, frac = {"en": (0, 500), "zh": (2, 500), "fr": (1, 0)}[lang]
        expected = base + (1 if _bucket(i) < frac else 0)
        got = sorted(by_doc.get(i, []))
        assert got == list(range(expected)), (i, lang, expected, got)


def test_epoch_mix_realized_weights_near_targets(spark):
    n = 3000
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "zh") for i in range(n)],
        "doc_id long, lang string",
    )
    out = epoch_mix(df, {"en": 0.5, "zh": 2.5}).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    assert abs(got["en"] / (n / 2) - 0.5) < 0.05
    assert abs(got["zh"] / (n / 2) - 2.5) < 0.05


def test_epoch_mix_is_deterministic_and_subset_stable(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(500)], "doc_id long, lang string"
    )
    a = sorted(map(tuple, epoch_mix(df, {"en": 1.5}).collect()))
    b = sorted(map(tuple, epoch_mix(df, {"en": 1.5}).collect()))
    assert a == b
    # a document's copy count doesn't depend on the rest of the corpus
    sub = sorted(
        map(tuple, epoch_mix(df.limit(50), {"en": 1.5}).collect())
    )
    full_first50 = [t for t in a if t[0] in {r[0] for r in sub}]
    assert sorted(full_first50) == sub


def test_temperature_mix_rebalances_toward_small_strata(spark):
    from vectra_py_spark.operators.mixing import temperature_mix

    # 900 en vs 100 zh; α=0.5 → w_en ∝ 30, w_zh ∝ 10 → zh upsamples
    # (epochs 2.5) and en downsamples (epochs 5/6)
    rows = [(i, "en") for i in range(900)] + [
        (i, "zh") for i in range(900, 1000)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_mix(df).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in out}
    assert 2.3 * 100 <= got["zh"] <= 2.7 * 100       # ≈ 2.5 epochs
    assert 0.75 * 900 <= got["en"] <= 0.92 * 900     # ≈ 5/6 epochs
    # total corpus size approximately preserved
    assert abs(sum(got.values()) - 1000) <= 60


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_temperature_mix_is_deterministic(spark):
    from vectra_py_spark.operators.mixing import temperature_mix

    rows = [(i, ["en", "zh"][i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    a = sorted(map(tuple, temperature_mix(df).collect()))
    b = sorted(map(tuple, temperature_mix(df).collect()))
    assert a == b


def test_dsir_importance_prefers_target_like_docs(spark):
    """Docs written in the target domain's vocabulary must outscore
    docs from a disjoint vocabulary — the defining DSIR property."""
    from pyspark.sql import functions as F

    from vectra_py_spark.operators.mixing import dsir_importance

    rows = (
        # target domain: physics-ish vocabulary
        [(i, "quantum field energy state " * 5, "tgt") for i in range(8)]
        # raw bulk: cooking vocabulary
        + [(100 + i, "butter flour sugar oven bake " * 5, "raw") for i in range(8)]
        # candidate A: target-like; candidate B: bulk-like
        + [(200, "quantum field energy state quantum field energy state", "cand"),
           (201, "butter flour sugar oven bake butter flour sugar", "cand")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r.doc_id: r.dsir_score
        for r in dsir_importance(df, F.col("source") == "tgt").collect()
    }
    # relative ordering is the DSIR invariant (absolute sign depends on
    # smoothing mass at toy scale): target-like clearly above bulk-like
    assert out[200] > out[201] + 1.0
    # deterministic across reruns
    out2 = {
        r.doc_id: r.dsir_score
        for r in dsir_importance(df, F.col("source") == "tgt").collect()
    }
    assert out == out2


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_curriculum_order_positions(spark):
    """Positions are a dense permutation 0..N-1, bins are ordered
    easy-first, and the layout is rerun-deterministic."""
    from pyspark.sql import functions as F

    from vectra_py_spark.operators.mixing import curriculum_order

    rows = [(i, "w " * (i + 1)) for i in range(40)]  # length grows with id
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curriculum_order(df, difficulty=F.length("text"), n_bins=4).collect()
    pos = sorted(r.pos for r in out)
    assert pos == list(range(40))
    # bin is monotone along the position order
    by_pos = sorted(out, key=lambda r: r.pos)
    bins = [r.bin for r in by_pos]
    assert bins == sorted(bins)
    # easy (short) docs land in bin 0, hard in the last bin
    assert by_pos[0].doc_id < 10 and by_pos[-1].doc_id >= 30
    again = curriculum_order(
        df, difficulty=F.length("text"), n_bins=4
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
