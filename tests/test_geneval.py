"""Generation-eval operators (`operators/geneval.py`): BLEU sentence +
corpus conventions, ROUGE-N orientation, ROUGE-L LCS, DuckDB twins,
and plan hygiene."""

import math

import duckdb
import pytest

from vectra_py_spark.operators.geneval import (
    bleu_corpus,
    bleu_pairs,
    bleu_pairs_sql,
    rouge_l_pairs,
    rouge_n_pairs,
    rouge_n_pairs_sql,
)


def _py_bleu(cand, ref, max_n=4):
    """Reference implementation of the documented convention."""
    c, r = cand.lower().split(), ref.lower().split()
    ps = []
    for n in range(1, max_n + 1):
        cg = [" ".join(c[i:i + n]) for i in range(len(c) - n + 1)]
        rg = [" ".join(r[i:i + n]) for i in range(len(r) - n + 1)]
        clip = sum(
            min(cg.count(g), rg.count(g))
            for g in set(cg)
        )
        tot = len(cg)
        if n == 1:
            ps.append(clip / tot if tot else 0.0)
        else:
            ps.append((clip + 1.0) / (tot + 1.0))
    if len(c) >= len(r):
        bp = 1.0
    elif c:
        bp = math.exp(1 - len(r) / len(c))
    else:
        bp = 0.0
    if not c or ps[0] == 0:
        return ps, bp, 0.0
    bleu = bp * math.exp(sum(math.log(p) for p in ps) / max_n)
    return ps, bp, bleu


PAIRS = [
    (0, "the cat sat on the mat", "the cat sat on the mat"),     # exact
    (1, "the cat the cat on mat", "the cat sat on the mat"),     # clipping
    (2, "completely different words here", "the cat sat on a mat"),
    (3, "the cat", "the cat sat on the mat"),                    # short cand
    (4, "", "the cat"),                                          # empty cand
    (5, "the cat sat on the mat today ok", "the cat"),           # long cand
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(
        PAIRS, "pair_id bigint, candidate string, reference string"
    )


def test_bleu_matches_reference_impl(pairs_df):
    got = {r.pair_id: r for r in bleu_pairs(pairs_df).collect()}
    for pid, cand, ref in PAIRS:
        ps, bp, bleu = _py_bleu(cand, ref)
        row = got[pid]
        for n, p in enumerate(ps, 1):
            assert getattr(row, f"p{n}") == pytest.approx(p, abs=1e-6), (
                pid, n
            )
        assert row.brevity_penalty == pytest.approx(bp, abs=1e-6)
        assert row.bleu == pytest.approx(bleu, abs=1e-6), pid
    assert got[0].bleu == 1.0              # identity pair is exactly 1
    assert got[4].bleu == 0.0 and got[4].cand_len == 0


@pytest.mark.slow
def test_bleu_sql_twin(spark, pairs_df):
    got = sorted(tuple(r) for r in bleu_pairs(pairs_df).collect())
    con = duckdb.connect()
    con.register("pairs", pairs_df.toPandas())
    want = sorted(tuple(r) for r in con.execute(bleu_pairs_sql()).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        for a, b in zip(g[1:], w[1:]):
            assert a == pytest.approx(b, abs=1e-9)


@pytest.mark.slow
def test_bleu_corpus_is_not_mean_of_sentences(spark, pairs_df):
    row = bleu_corpus(pairs_df).first()
    assert row.n_pairs == 6
    assert row.cand_tokens == sum(len(c.split()) for _, c, _ in PAIRS)
    # corpus p1 = total clipped unigrams / total candidate unigrams
    clip1 = tot1 = 0
    for _, cand, ref in PAIRS:
        c, r = cand.lower().split(), ref.lower().split()
        clip1 += sum(min(c.count(g), r.count(g)) for g in set(c))
        tot1 += len(c)
    assert row.p1 == pytest.approx(clip1 / tot1, abs=1e-6)
    sent = bleu_pairs(pairs_df).collect()
    mean_sent = sum(r.bleu for r in sent) / len(sent)
    assert row.bleu != pytest.approx(mean_sent, abs=1e-3)


@pytest.mark.slow
def test_rouge_n(spark, pairs_df):
    got = {r.pair_id: r for r in rouge_n_pairs(pairs_df, n=1).collect()}
    # pair 3: cand "the cat" fully inside ref of 6 unigrams
    r3 = got[3]
    assert (r3.overlap, r3.cand_ngrams, r3.ref_ngrams) == (2, 2, 6)
    assert r3.precision == 1.0
    assert r3.recall == pytest.approx(2 / 6, abs=1e-6)
    assert r3.f1 == pytest.approx(2 * 1.0 * (2 / 6) / (1.0 + 2 / 6), abs=1e-6)
    # pair 4: empty candidate -> all zeros, but the row EXISTS
    assert got[4].overlap == 0 and got[4].f1 == 0.0
    bi = {r.pair_id: r for r in rouge_n_pairs(pairs_df, n=2).collect()}
    assert bi[0].f1 == 1.0 and bi[2].overlap == 0


@pytest.mark.slow
def test_rouge_n_sql_twin(spark, pairs_df):
    for n in (1, 2):
        got = sorted(
            tuple(r) for r in rouge_n_pairs(pairs_df, n=n).collect()
        )
        con = duckdb.connect()
        con.register("pairs", pairs_df.toPandas())
        want = sorted(
            tuple(r)
            for r in con.execute(rouge_n_pairs_sql(n=n)).fetchall()
        )
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[0] == w[0] and g[1:4] == w[1:4]
            for a, b in zip(g[4:], w[4:]):
                assert a == pytest.approx(b, abs=1e-9)


def _py_lcs(a, b):
    import functools

    @functools.lru_cache(maxsize=None)
    def f(i, j):
        if i == 0 or j == 0:
            return 0
        if a[i - 1] == b[j - 1]:
            return f(i - 1, j - 1) + 1
        return max(f(i - 1, j), f(i, j - 1))

    return f(len(a), len(b))


def test_rouge_l(spark, pairs_df):
    got = {r.pair_id: r for r in rouge_l_pairs(pairs_df).collect()}
    for pid, cand, ref in PAIRS:
        a, b = tuple(cand.lower().split()), tuple(ref.lower().split())
        want = _py_lcs(a, b)
        row = got[pid]
        assert row.lcs_len == want, pid
        assert (row.cand_len, row.ref_len) == (len(a), len(b))
        if a and b:
            p, r = want / len(a), want / len(b)
            f1 = 2 * p * r / (p + r) if p + r else 0.0
            assert row.f1 == pytest.approx(f1, abs=1e-6)


@pytest.mark.slow
def test_rouge_l_truncation_bound(spark):
    # 3000-token candidate against itself, truncated at 1024 a side:
    # the DP sees exactly max_tokens tokens and reports those lengths
    txt = " ".join(f"w{i}" for i in range(3000))
    df = spark.createDataFrame(
        [(0, txt, txt)], "pair_id bigint, candidate string, reference string"
    )
    row = rouge_l_pairs(df, max_tokens=1024).first()
    assert row.cand_len == row.ref_len == row.lcs_len == 1024
    assert row.f1 == 1.0


@pytest.mark.slow
def test_bleu_plan_stays_jvm_side(spark, pairs_df):
    plan = (
        bleu_pairs(pairs_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
