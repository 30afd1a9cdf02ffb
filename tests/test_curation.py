"""Semantics of the curation/mixing/PQ operators on planted data.

The fixture corpus is single-line punctuation-free text, so the
line-oriented rules (C4, CCNet line dedup, Gopher bullet/ellipsis
ratios) are exercised here with multi-line planted documents.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators import curation as cu
from vectra_py_spark.operators import mixing as mx
from vectra_py_spark.operators import quantize as qz


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------
def _good_doc() -> str:
    # 60 words, mean length in [3, 10], stopwords present, no symbols
    words = ["the", "and", "that", "have"] + [f"word{i}" for i in range(56)]
    return " ".join(words)


def test_gopher_passes_clean_doc(spark):
    df = spark.createDataFrame([(1, _good_doc())], ["doc_id", "text"])
    r = cu.gopher_quality(df).collect()[0]
    assert r.n_words == 60
    assert r.pass_words and r.pass_mean_word_len and r.pass_symbols
    assert r.pass_alpha and r.pass_bullets and r.pass_ellipsis
    assert r.pass_stopwords and r.pass_gopher


@pytest.mark.parametrize(
    "text,failed_flag",
    [
        ("the and short doc", "pass_words"),  # < 50 words
        (
            " ".join(["the", "and"] + ["supercalifragilistic"] * 58),
            "pass_mean_word_len",
        ),  # mean word length > 10
        (
            " ".join(["the", "and"] + ["#"] * 10 + ["word"] * 48),
            "pass_symbols",
        ),  # symbol ratio > 0.1
        (
            " ".join(["the", "and"] + ["12345"] * 20 + ["word"] * 38),
            "pass_alpha",
        ),  # < 80% words contain a letter
        (
            "\n".join(["- bullet line the and"] * 50),
            "pass_bullets",
        ),  # > 90% bullet lines
        (
            "\n".join(["the and trailing line..."] * 50),
            "pass_ellipsis",
        ),  # > 30% ellipsis-ended lines
        (" ".join(["word"] * 60), "pass_stopwords"),  # no stopwords
    ],
)
def test_gopher_rules_fail_individually(spark, text, failed_flag):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = cu.gopher_quality(df).collect()[0]
    assert not r[failed_flag], f"{failed_flag} should fail"
    assert not r.pass_gopher


# ---------------------------------------------------------------------------
# C4 line rules
# ---------------------------------------------------------------------------
def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "This is a proper sentence with enough words.",  # kept
            "Another good long sentence ends with a question?",  # kept
            'A third quoted sentence keeps the quote here."',  # kept
            "no terminal punctuation so this line goes away",  # dropped
            "Too short.",  # dropped (< 5 words)
            "Enable javascript to view this fancy page.",  # dropped
            "",  # empty — not counted
        ]
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = cu.c4_line_stats(df).collect()[0]
    assert r.n_lines == 6
    assert r.n_kept == 3
    assert r.keep_doc and not r.doc_flagged


def test_c4_doc_flags(spark):
    rows = [
        (1, "Lorem Ipsum dolor sit amet is placeholder filler text."),
        (2, "This config block { is code } not prose sentences."),
        (3, "Only two good sentences live here today friends.\n"
            "That is not enough kept lines for the page."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in cu.c4_line_stats(df).collect()}
    assert out[1].doc_flagged and not out[1].keep_doc
    assert out[2].doc_flagged and not out[2].keep_doc
    # not flagged, but fewer than 3 kept lines
    assert not out[3].doc_flagged and not out[3].keep_doc
    assert out[3].n_kept == 2


# ---------------------------------------------------------------------------
# CCNet line-level boilerplate
# ---------------------------------------------------------------------------
def test_line_dedup_flags_shared_footer(spark):
    footer = "Copyright Example Corp all rights reserved"
    rows = [
        (1, f"unique one body line\n{footer}"),
        (2, f"different body content here\n{footer}"),
        (3, f"third body text entirely\n{footer.upper()}"),  # case-insensitive
        (4, "a loner document with no shared lines"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in cu.line_dedup_stats(df).collect()}
    for d in (1, 2, 3):
        assert out[d].n_lines == 2 and out[d].n_boiler == 1
        assert out[d].kept_ratio == 0.5
    assert out[4].n_boiler == 0 and out[4].kept_ratio == 1.0


def test_line_dedup_counts_distinct_docs_not_occurrences(spark):
    # the same line repeated INSIDE one doc is not boilerplate
    df = spark.createDataFrame(
        [(1, "repeat me\nrepeat me\nrepeat me"), (2, "something else")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in cu.line_dedup_stats(df).collect()}
    assert out[1].n_lines == 1  # distinct lines per doc
    assert out[1].n_boiler == 0


# ---------------------------------------------------------------------------
# Length percentile trim
# ---------------------------------------------------------------------------
def test_length_trim_band(spark):
    rows = [(i, "s", i) for i in range(1, 22)]  # n=21, pr = (rank-1)/20
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    kept = {r.doc_id for r in cu.length_trim(df).collect()}
    # pr(1)=0.0 < 0.05 dropped; pr(2)=0.05 kept; pr(20)=0.95 kept;
    # pr(21)=1.0 dropped
    assert kept == set(range(2, 21))


def test_length_trim_is_per_source(spark):
    rows = [(i, "a", i) for i in range(1, 22)] + [(100 + i, "b", i) for i in range(1, 22)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = cu.length_trim(df).collect()
    assert {r.doc_id for r in out if r.source == "a"} == set(range(2, 21))
    assert {r.doc_id for r in out if r.source == "b"} == {100 + i for i in range(2, 21)}


# ---------------------------------------------------------------------------
# UniMax water-filling
# ---------------------------------------------------------------------------
def test_unimax_waterfill_hand_computed(spark):
    # tokens: a=10, b=100, c=1000; total=1110; budget=0.5*1110=555
    # caps (4 epochs): 40, 400, 4000. Sorted asc: a, b, c.
    # level@a = 555/3 = 185 > 40 -> a capped at 40
    # level@b = (555-40)/2 = 257.5 <= 400 -> waterline 257.5
    # alloc: a=40, b=257.5, c=257.5
    rows = (
        [(i, "a", " ".join(["w"] * 10)) for i in range(1)]
        + [(10 + i, "b", " ".join(["w"] * 100)) for i in range(1)]
        + [(20 + i, "c", " ".join(["w"] * 1000)) for i in range(1)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r.source: r for r in mx.unimax_mix(df).collect()}
    assert out["a"].alloc_tokens == 40.0 and out["a"].epochs == 4.0
    assert out["b"].alloc_tokens == 257.5 and out["b"].epochs == 2.575
    assert out["c"].alloc_tokens == 257.5 and out["c"].epochs == 0.2575
    # budget conserved
    assert sum(r.alloc_tokens for r in out.values()) == 555.0


def test_unimax_budget_exceeds_capacity(spark):
    # budget > total capacity: every source capped, budget unmet
    df = spark.createDataFrame(
        [(1, "a", "w w"), (2, "b", "w w w")], ["doc_id", "source", "text"]
    )
    out = {r.source: r for r in mx.unimax_mix(df, budget_frac=10.0, max_epochs=2.0).collect()}
    assert out["a"].alloc_tokens == out["a"].capacity == 4.0
    assert out["b"].alloc_tokens == out["b"].capacity == 6.0


def test_domain_mix_shares_sum_to_one(spark):
    df = spark.createDataFrame(
        [(1, "a", "en", "x y z"), (2, "a", "de", "x y"), (3, "b", "en", "x")],
        ["doc_id", "source", "lang", "text"],
    )
    out = mx.domain_mix_report(df).collect()
    assert abs(sum(r.token_share for r in out) - 1.0) < 1e-9
    by = {(r.source, r.lang): r for r in out}
    assert by[("a", "en")].n_tokens == 3
    assert by[("a", "en")].token_share == 0.5


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------
def test_pq_encode_recovers_planted_centroids(spark):
    cb = qz.pq_codebook(dim=16, m=2, ks=4, seed=11)
    # vector assembled exactly from centroid 2 of sub 0 + centroid 1 of sub 1
    v = [c / qz.PQ_SCALE for c in cb[0][2]] + [c / qz.PQ_SCALE for c in cb[1][1]]
    df = spark.createDataFrame([(1, v)], ["vec_id", "embedding"])
    codes = qz.pq_encode(df, cb).collect()[0].codes
    assert list(codes) == [2, 1]


def test_pq_topk_nearest_first_and_tie_break(spark):
    cb = qz.pq_codebook(dim=16, m=2, ks=4, seed=11)
    target = [c / qz.PQ_SCALE for c in cb[0][0]] + [
        c / qz.PQ_SCALE for c in cb[1][0]
    ]
    far = [-x for x in target]
    rows = [(1, target), (2, target), (3, far)]  # 1 and 2 tie exactly
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = qz.pq_topk(df, target, k=3, codebook=cb).collect()
    assert [r.vec_id for r in out] == [1, 2, 3]  # tie -> lower id first
    assert out[0].adc == out[1].adc == 0  # exact centroid hit, ADC 0
    assert out[2].adc > 0


def test_pq_codebook_deterministic():
    assert qz.pq_codebook(seed=5) == qz.pq_codebook(seed=5)
    assert qz.pq_codebook(seed=5) != qz.pq_codebook(seed=6)
    with pytest.raises(ValueError):
        qz.pq_codebook(dim=10, m=3)


# ---------------------------------------------------------------------------
# OOV rate
# ---------------------------------------------------------------------------
def test_oov_rate_counts(spark):
    from vectra_py_spark.operators import text_analysis as ta

    # vocab_size=2 keeps the two most frequent words ('x' 4x, 'y' 3x)
    df = spark.createDataFrame(
        [(1, "a", "x x y rare1"), (2, "a", "x y"), (3, "b", "x y rare2")],
        ["doc_id", "source", "text"],
    )
    vocab = ta.build_vocab(df, vocab_size=2)
    out = {r.source: r for r in ta.oov_rate(df, vocab).collect()}
    assert out["a"].n_tokens == 6 and out["a"].n_oov == 1
    assert out["b"].n_tokens == 3 and out["b"].n_oov == 1
    assert out["a"].oov_rate == pytest.approx(1 / 6, abs=1e-6)


# ---------------------------------------------------------------------------
# NFC normalization
# ---------------------------------------------------------------------------
def test_nfc_normalize_composes_and_scrubs(spark):
    import hashlib

    decomposed = "caf" + "é"  # e + combining acute
    composed = "café"
    rows = [
        (1, decomposed),
        (2, composed),
        (3, "ctl\x00char  and   runs"),
        (4, "already clean"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in cu.nfc_normalize(df).collect()}
    # NFC folds both spellings to the same hash
    assert out[1].norm_hash == out[2].norm_hash
    assert out[1].changed and not out[2].changed
    assert out[1].n_chars_norm == 4
    # control char stripped, space runs collapsed
    expect = "ctlchar and runs"
    assert out[3].norm_hash == hashlib.md5(expect.encode()).hexdigest()
    assert out[3].changed
    assert not out[4].changed


# ---------------------------------------------------------------------------
# IVF-PQ composite
# ---------------------------------------------------------------------------
def test_ivfpq_probes_and_ranks(spark):
    cb = qz.pq_codebook()  # dim 64, m 8, ks 16
    target = [c / qz.PQ_SCALE for s in range(8) for c in cb[s][0]]
    far = [-x for x in target]
    df = spark.createDataFrame(
        [(1, target), (7, target), (3, far)], ["vec_id", "embedding"]
    )
    out = qz.ivfpq_topk(df, target, k=3, codebook=cb).collect()
    ids = [r.vec_id for r in out]
    # the query's own cell is always probed: both copies surface, exact
    # codebook hit -> ADC 0, tie broken by id
    assert ids[:2] == [1, 7]
    assert out[0].adc == out[1].adc == 0


# ---------------------------------------------------------------------------
# Curation funnel
# ---------------------------------------------------------------------------
@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_curation_funnel_stage_counts(spark):
    good = _good_doc()
    neardup = good.replace("word10", "word99").replace("word20", "word88")
    rows = [
        (1, good),
        (2, good),            # exact dup of 1 -> dropped at s2
        (3, neardup),         # near-dup of 1 -> dropped at s3
        (4, "too short"),     # fails gopher -> dropped at s1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.stage: r for r in cu.curation_funnel(df).collect()}
    assert out["s0_input"].n_docs == 4
    assert out["s1_quality"].n_docs == 3
    assert out["s2_exact"].n_docs == 2
    assert out["s3_neardup"].n_docs == 1
    # tokens decrease monotonically through the funnel
    toks = [out[s].n_tokens for s in ("s0_input", "s1_quality", "s2_exact", "s3_neardup")]
    assert toks == sorted(toks, reverse=True)
    assert out["s3_neardup"].n_tokens == 60


# ---------------------------------------------------------------------------
# Embedding label QA / entropy / dup-rate
# ---------------------------------------------------------------------------
def test_label_outliers_flags_planted_mislabel(spark):
    from vectra_py_spark.operators.similarity import label_outliers

    # label 0 clusters near +x; vec 99 is labeled 0 but points at -x
    rows = [(i, [1.0, 0.1 * (i % 3), 0.0, 0.0], 0) for i in range(6)]
    rows.append((99, [-1.0, 0.0, 0.0, 0.0], 0))
    rows += [(200 + i, [0.0, 1.0, 0.0, 0.0], 1) for i in range(3)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = label_outliers(df, per_label=2)
    got = {(r.label, r.vec_id): r.cos_to_centroid for r in out.collect()}
    # the planted mislabel is label 0's worst outlier
    worst = min((v, k) for k, v in got.items() if k[0] == 0)
    assert worst[1] == (0, 99)
    assert worst[0] < 0  # anti-aligned with its centroid
    # per_label cap respected
    assert sum(1 for k in got if k[0] == 0) == 2


def test_word_entropy_hand_computed(spark):
    import math

    from vectra_py_spark.operators.text_analysis import word_entropy

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b"), (3, "a a b")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in word_entropy(df).collect()}
    assert out[1].entropy == 0.0 and out[1].norm_entropy == 0.0
    assert out[2].entropy == 1.0 and out[2].norm_entropy == 1.0
    h3 = math.log2(3) - (2 * math.log2(2)) / 3
    assert out[3].entropy == pytest.approx(h3, abs=1e-6)
    assert out[3].n_words == 3 and out[3].n_types == 2


def test_dup_rate_by_source(spark):
    from vectra_py_spark.operators.dedup import dup_rate_by_source

    rows = [
        (1, "a", "same text"),
        (2, "a", "same text"),
        (3, "a", "other text"),
        (4, "b", "unique here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r.source: r for r in dup_rate_by_source(df).collect()}
    assert out["a"].n_docs == 3 and out["a"].n_distinct == 2
    assert out["a"].dup_rate == pytest.approx(1 / 3, abs=1e-6)
    assert out["b"].dup_rate == 0.0


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_gopher_quality_runs_unchanged_on_a_stream(spark, tmp_path):
    """The curation filters are pure projections, so the SAME operator
    works on a readStream frame with zero changes — batch/stream
    unification, asserted by comparing against the batch result."""
    rows = [(1, _good_doc()), (2, "too short"), (3, " ".join(["word"] * 60))]
    src = spark.createDataFrame(rows, ["doc_id", "text"])
    d = str(tmp_path / "gq_src")
    src.write.parquet(d)
    stream = spark.readStream.schema(src.schema).parquet(d)
    q = (
        cu.gopher_quality(stream)
        .writeStream.format("memory")
        .queryName("gq_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_words, r.pass_gopher)
        for r in spark.sql("SELECT * FROM gq_stream").collect()
    }
    want = {
        r.doc_id: (r.n_words, r.pass_gopher)
        for r in cu.gopher_quality(src).collect()
    }
    assert got == want and len(got) == 3


def test_pq_train_codebook_deterministic_and_shaped(spark):
    rows = [(i, [float((i * 7 + j) % 13) / 13 for j in range(16)])
            for i in range(64)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = qz.pq_train_codebook(df, dim=16, m=2, ks=4, sample_rows=64)
    b = qz.pq_train_codebook(df, dim=16, m=2, ks=4, sample_rows=64)
    assert a == b
    assert len(a) == 2 and len(a[0]) == 4 and len(a[0][0]) == 8


def test_pq_rerank_recovers_exact_topk_on_planted(spark):
    from vectra_py_spark.operators.similarity import cosine_topk

    cb = qz.pq_codebook(dim=16, m=2, ks=4, seed=11)
    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = [rng.uniform(-1, 1) for _ in range(16)]
    exact = [r.vec_id for r in cosine_topk(df, q, k=5).collect()]
    # oversample big enough to make the shortlist ⊇ exact top-k here
    rer = [r.vec_id for r in
           qz.pq_topk_rerank(df, q, k=5, oversample=12, codebook=cb).collect()]
    assert rer == exact


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", "one"), (2, "a", "two"), (3, "b", "three")],
        ["doc_id", "source", "text"],
    )
    new = spark.createDataFrame(
        [(1, "a", "one"), (2, "a", "TWO CHANGED"), (4, "b", "four")],
        ["doc_id", "source", "text"],
    )
    out = {(r.source, r.status): r.n_docs
           for r in cu.corpus_diff(old, new).collect()}
    assert out == {
        ("a", "unchanged"): 1,
        ("a", "changed"): 1,
        ("b", "removed"): 1,
        ("b", "added"): 1,
    }


def test_content_checksum_order_independent_and_sensitive(spark):
    rows = [(1, "a", "one"), (2, "a", "two"), (3, "b", "three")]
    df1 = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    df2 = spark.createDataFrame(rows[::-1], ["doc_id", "source", "text"])
    c1 = {r.source: (r.n_rows, r.checksum)
          for r in cu.content_checksum(df1).collect()}
    c2 = {r.source: (r.n_rows, r.checksum)
          for r in cu.content_checksum(df2).collect()}
    assert c1 == c2  # row order never matters
    # a single changed character changes the source's checksum
    df3 = spark.createDataFrame(
        [(1, "a", "one!"), (2, "a", "two"), (3, "b", "three")],
        ["doc_id", "source", "text"],
    )
    c3 = {r.source: (r.n_rows, r.checksum)
          for r in cu.content_checksum(df3).collect()}
    assert c3["a"] != c1["a"] and c3["b"] == c1["b"]


def test_embedding_coverage_counts_missing(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b")],
        ["doc_id", "source"],
    )
    emb = spark.createDataFrame([(1,), (3,), (4,)], ["vec_id"])
    got = {
        r.source: (r.n_docs, r.n_embedded, r.coverage)
        for r in cu.embedding_coverage(docs, emb).collect()
    }
    assert got == {"a": (2, 1, 0.5), "b": (3, 2, round(2 / 3, 6))}


def test_encoding_report_flags_planted_artifacts(spark):
    df = spark.createDataFrame(
        [
            (1, "perfectly clean prose here", "a"),
            (2, "broken quote â€™ and accent Ã© artifacts", "a"),
            (3, "lost char � and ctrl \x07 byte", "b"),
            (4, "also clean", "b"),
        ],
        ["doc_id", "text", "source"],
    )
    got = {r.source: r for r in cu.encoding_report(df).collect()}
    assert got["a"].n_docs == 2 and got["a"].n_flagged == 1
    assert got["a"].mojibake_hits == 2          # â€™ + Ã©
    assert got["a"].pct_flagged == 0.5
    assert got["b"].replacement_hits == 1
    assert got["b"].control_hits == 1
    assert got["b"].n_flagged == 1


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_encoding_report_cross_engine_parity_on_planted(spark, tmp_path):
    """The regex classes must count identically under Java regex
    (Spark) and RE2 (DuckDB) — the fixture corpus is clean, so the
    driver oracle alone would only ever compare zeros."""
    import duckdb

    rows = [
        (1, "broken â€™ quote â€œ and Ã© Ã¼ accents", "web"),
        (2, "lost � � chars and \x07\x1f ctrl", "web"),
        (3, "clean text", "book"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    path = str(tmp_path / "enc.parquet")
    df.coalesce(1).write.parquet(path)

    got = [
        (r.source, r.n_docs, r.n_flagged, r.pct_flagged,
         r.mojibake_hits, r.control_hits, r.replacement_hits)
        for r in cu.encoding_report(df).collect()
    ]
    sql = cu.encoding_report_sql(table=f"read_parquet('{path}/*.parquet')")
    want = [tuple(t) for t in duckdb.connect().execute(sql).fetchall()]
    assert got == want


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_content_checksum_null_cells_cross_engine(spark, tmp_path):
    """NULL cells must hash identically on both engines (concat_ws
    skips NULLs; the sentinel restores parity) and differ from ''."""
    import duckdb

    rows = [(1, "a", None), (2, "a", ""), (3, None, "x")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    path = str(tmp_path / "cc.parquet")
    df.coalesce(1).write.parquet(path)
    key = lambda t: (t[0] is None, t)  # noqa: E731 — NULLS FIRST/LAST differ
    got = sorted(
        ((r.source, r.n_rows, r.checksum)
         for r in cu.content_checksum(df).collect()), key=key)
    sql = cu.content_checksum_sql(table=f"read_parquet('{path}/*.parquet')")
    want = sorted(
        (tuple(t) for t in duckdb.connect().execute(sql).fetchall()), key=key)
    assert got == want
    # NULL text and empty text produce different checksums
    df2 = spark.createDataFrame(
        [(1, "a", None)], "doc_id bigint, source string, text string")
    df3 = spark.createDataFrame(
        [(1, "a", "")], "doc_id bigint, source string, text string")
    c2 = cu.content_checksum(df2).collect()[0].checksum
    c3 = cu.content_checksum(df3).collect()[0].checksum
    assert c2 != c3


def test_corpus_diff_null_text_rows_keep_presence(spark):
    """Presence must come from row existence, not hash nullity — a
    NULL-text row (e.g. quarantined parse) in only the old snapshot is
    'removed', and NULL == NULL text is 'unchanged'."""
    cols = "doc_id bigint, source string, text string"
    old = spark.createDataFrame(
        [(1, "a", None), (2, "a", "same"), (3, "a", None)], cols)
    new = spark.createDataFrame(
        [(2, "a", "same"), (3, "a", None), (4, "a", "fresh")], cols)
    out = {(r.source, r.status): r.n_docs
           for r in cu.corpus_diff(old, new).collect()}
    assert out == {
        ("a", "removed"): 1,    # doc 1 (NULL text, old only)
        ("a", "unchanged"): 2,  # doc 2 + doc 3 (NULL == NULL)
        ("a", "added"): 1,      # doc 4
    }


def test_nfc_normalize_keeps_null_text_rows(spark):
    df = spark.createDataFrame(
        [(1, "café"), (2, None)], "doc_id bigint, text string")
    out = {r.doc_id: r for r in cu.nfc_normalize(df).collect()}
    assert len(out) == 2                      # NULL row not dropped
    assert out[2].norm_hash is None and out[2].changed is None
    assert out[1].changed and out[1].n_chars_norm == 4  # NFC composed


def test_fix_mojibake(spark):
    """Mojibake repair: cp1252-decoded UTF-8 is reversed; clean text,
    genuine Latin-1 accents, CJK, and replacement-producing inputs
    pass through untouched."""
    from vectra_py_spark.operators.curation import fix_mojibake

    rows = [
        ("a", "cafÃ© et naÃ¯ve"),                # latin-range mojibake
        ("b", "itâ€™s a â€œquoteâ€\x9d here"),  # cp1252 punctuation mojibake
        ("c", "clean plain text"),               # untouched
        ("d", "café already correct"),           # accents, no artifact
        ("e", "日本語テキスト"),                  # CJK: not cp1252-safe
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r.id: r for r in fix_mojibake(df).collect()}
    assert got["a"].text == "café et naïve" and got["a"].was_repaired
    assert got["b"].text == "it’s a “quote” here" and got["b"].was_repaired
    for k in ("c", "d", "e"):
        assert got[k].text == dict(rows)[k]
        assert not got[k].was_repaired
