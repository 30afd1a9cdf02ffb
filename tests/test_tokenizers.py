"""Vendored byte-level BPE (T5 parity path) — algorithm-exact GPT-2
mechanics over the embedded merge table. No Spark needed."""

from __future__ import annotations

from vectra_py_spark.text.tokenizers import (
    SEED_CORPUS,
    VENDORED_MERGES,
    ByteLevelBPETokenizer,
    bytes_to_unicode,
    get_tokenizer,
    train_bpe_merges,
)

TOK = ByteLevelBPETokenizer()


def test_byte_alphabet_is_bijective():
    b2u = bytes_to_unicode()
    assert len(b2u) == 256
    assert len(set(b2u.values())) == 256
    assert b2u[ord("A")] == "A"  # printable ASCII maps to itself


def test_vendored_merges_reproducible():
    assert train_bpe_merges(SEED_CORPUS, 256) == VENDORED_MERGES
    assert len(VENDORED_MERGES) == 256


def test_roundtrip_lossless():
    # byte-level BPE decodes ANY input exactly — including text far off
    # the seed corpus (unicode, emoji, code, mixed whitespace)
    samples = [
        "the quick brown fox",
        "Füße größer 北京 🎉 tabs\tand\nnewlines",
        "def f(x):\n    return x ** 2  # comment",
        "",
        "    leading and trailing    ",
    ]
    for s in samples:
        assert TOK.decode(TOK.encode(s)) == s


def test_common_words_merge_rare_words_split():
    # frequent seed-corpus words compress to one token; an off-corpus
    # word falls back to finer-grained subword/byte pieces
    assert len(TOK.encode(" the")) == 1
    assert len(TOK.encode(" and")) == 1
    rare = TOK.encode(" zyzzyva")
    assert len(rare) > 1
    assert TOK.decode(rare) == " zyzzyva"


def test_deterministic_across_instances():
    a = ByteLevelBPETokenizer()
    b = ByteLevelBPETokenizer()
    text = "plans move data between machines " * 3
    assert a.encode(text) == b.encode(text)
    assert a.count(text) == len(a.encode(text))


def test_merge_priority_is_rank_order():
    # ' th'+'e' must merge via the low-rank pairs first: ' the' is a
    # single vocab entry built from ('Ġ','t')→('Ġt','h')→('Ġth','e')
    ids = TOK.encode(" the")
    assert TOK._tok_of[ids[0]] == "Ġthe"


def test_get_tokenizer_falls_back_to_bpe():
    t = get_tokenizer()  # no tiktoken in this container
    assert isinstance(t, ByteLevelBPETokenizer)
