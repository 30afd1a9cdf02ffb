"""Round-12 post-training extras: chat-template rendering
(`chat.py::render_chat_text`), Wilson win rates
(`preference.py::win_rates`), and chrF (`geneval.py::chrf_pairs`)."""

import json
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.chat import (
    parse_conversations,
    render_chat_text,
)
from vectra_py_spark.operators.geneval import chrf_pairs, chrf_pairs_sql
from vectra_py_spark.operators.preference import win_rates


def test_render_chat_text(spark):
    msgs = json.dumps([
        {"role": "system", "content": "be terse"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
    ])
    df = spark.createDataFrame(
        [(1, msgs), (2, "not json")], "conv_id bigint, messages string"
    )
    out = {
        r.conv_id: r
        for r in render_chat_text(parse_conversations(df)).collect()
    }
    assert out[1].text == (
        "<|system|>\nbe terse<|end|>\n"
        "<|user|>\nhi<|end|>\n"
        "<|assistant|>\nhello<|end|>\n"
    )
    assert out[1].n_turns == 3
    # error-only conversations drop (no text to train on)
    assert 2 not in out
    # custom framing: the {role} template interpolates
    zephyr = render_chat_text(
        parse_conversations(df), role_open="<|{role}|>\n", turn_close="</s>\n"
    ).where("conv_id = 1").first()
    assert zephyr.text.endswith("hello</s>\n")


@pytest.mark.slow
def test_render_feeds_tokenize_pack(spark):
    """render -> tokenize -> pack is the SFT data path: the rendered
    text flows into the packing op without adapters."""
    from vectra_py_spark.operators.packing import pack_sequences

    msgs = json.dumps([
        {"role": "user", "content": "one two three"},
        {"role": "assistant", "content": "four five"},
    ])
    df = spark.createDataFrame(
        [(i, msgs) for i in range(8)], "conv_id bigint, messages string"
    )
    rendered = render_chat_text(parse_conversations(df))
    docs = rendered.select(
        F.col("conv_id").alias("doc_id"),
        F.lit("sft").alias("source"),
        F.col("text"),
    )
    packed = pack_sequences(docs, budget=32)
    assert packed.count() == 8
    assert packed.agg(F.max("n_used")).first()[0] <= 32


def test_win_rates_wilson(spark):
    comps = spark.createDataFrame(
        [("a", "b")] * 9 + [("b", "a")], "winner string, loser string"
    )
    got = {r.item: r for r in win_rates(comps).collect()}
    a = got["a"]
    assert (a.wins, a.n_games) == (9, 10)
    assert a.win_rate == 0.9
    # closed-form Wilson at p=.9, n=10, z=1.96
    z = 1.959963984540054
    n, p = 10, 0.9
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert a.wilson_low == pytest.approx(center - half, abs=1e-6)
    assert a.wilson_high == pytest.approx(center + half, abs=1e-6)
    b = got["b"]
    assert b.win_rate == pytest.approx(0.1, abs=1e-6)
    # interval is clamped to [0, 1] and never degenerate at extremes
    onewin = spark.createDataFrame(
        [("c", "d")], "winner string, loser string"
    )
    c = {r.item: r for r in win_rates(onewin).collect()}["c"]
    assert c.win_rate == 1.0 and c.wilson_low < 1.0 <= c.wilson_high


def _py_chrf(cand, ref, max_n=6, beta=2.0):
    import re

    c = re.sub(r"\s+", "", cand.lower())
    r = re.sub(r"\s+", "", ref.lower())
    ps, rs = [], []
    for n in range(1, max_n + 1):
        cg = [c[i:i + n] for i in range(len(c) - n + 1)]
        rg = [r[i:i + n] for i in range(len(r) - n + 1)]
        clip = sum(min(cg.count(g), rg.count(g)) for g in set(cg))
        if cg:
            ps.append(clip / len(cg))
        if rg:
            rs.append(clip / len(rg))
    p = sum(ps) / len(ps) if ps else 0.0
    rr = sum(rs) / len(rs) if rs else 0.0
    b2 = beta * beta
    if b2 * p + rr == 0:
        return p, rr, 0.0
    return p, rr, (1 + b2) * p * rr / (b2 * p + rr)


CHRF_PAIRS = [
    (0, "the cat sat", "the cat sat"),
    (1, "the cta sat", "the cat sat"),      # transposition: chrF>0
    (2, "xyz", "the cat sat"),
    (3, "", "the cat"),
    (4, "short", "sh"),
]


def test_chrf_matches_reference_impl(spark):
    df = spark.createDataFrame(
        CHRF_PAIRS, "pair_id bigint, candidate string, reference string"
    )
    got = {r.pair_id: r for r in chrf_pairs(df).collect()}
    for pid, cand, ref in CHRF_PAIRS:
        p, r, f = _py_chrf(cand, ref)
        assert got[pid].chr_p == pytest.approx(p, abs=1e-6), pid
        assert got[pid].chr_r == pytest.approx(r, abs=1e-6), pid
        assert got[pid].chrf == pytest.approx(f, abs=1e-6), pid
    assert got[0].chrf == 1.0
    # the transposed candidate keeps substantial char mass: chrF sees
    # what word-level matching would nearly zero out
    assert got[1].chrf > 0.3
    assert got[3].chrf == 0.0


@pytest.mark.slow
def test_chrf_sql_twin(spark):
    df = spark.createDataFrame(
        CHRF_PAIRS, "pair_id bigint, candidate string, reference string"
    )
    got = sorted(tuple(r) for r in chrf_pairs(df).collect())
    con = duckdb.connect()
    con.register("pairs", df.toPandas())
    want = sorted(tuple(r) for r in con.execute(chrf_pairs_sql()).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        for a, b in zip(g[1:], w[1:]):
            assert a == pytest.approx(b, abs=1e-9)
