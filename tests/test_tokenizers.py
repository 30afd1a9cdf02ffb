"""Vendored byte-level BPE (T5 parity path) — algorithm-exact GPT-2
mechanics over the embedded merge table. No Spark needed."""

from __future__ import annotations

import pytest

from vectra_py_spark.text.tokenizers import (
    MERGES_FILE_ENV,
    SEED_CORPUS,
    VENDORED_MERGES,
    ByteLevelBPETokenizer,
    bytes_to_unicode,
    get_tokenizer,
    load_merges_file,
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


# A tiny merges file in the released GPT-2 merges.txt format (version
# header + rank-ordered space-separated pairs). The pairs themselves are
# the head of a real released table's ordering shape: whitespace-prefixed
# function-word merges first.
_MERGES_TXT = """#version: 0.2
Ġ t
Ġ a
h e
i n
r e
o n
Ġt he
"""


def _write_merges(tmp_path):
    p = tmp_path / "merges.txt"
    p.write_text(_MERGES_TXT, encoding="utf-8")
    return str(p)


def test_load_merges_file_parses_released_format(tmp_path):
    path = _write_merges(tmp_path)
    merges = load_merges_file(path)
    assert merges[0] == ("Ġ", "t")
    assert merges[-1] == ("Ġt", "he")
    assert len(merges) == 7
    tok = ByteLevelBPETokenizer.from_merges_file(path)
    # ' the' must resolve via rank order to the single 'Ġthe' symbol:
    # ('Ġ','t') rank 0, then ('h','e') rank 2, then ('Ġt','he') rank 6.
    ids = tok.encode(" the")
    assert [tok._tok_of[i] for i in ids] == ["Ġthe"]
    assert tok.decode(tok.encode("any text at all")) == "any text at all"


def test_load_merges_file_rejects_malformed(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("#version: 0.2\nĠ t\nthree part line\n", encoding="utf-8")
    with pytest.raises(ValueError, match="bad.txt:3"):
        load_merges_file(str(p))
    p2 = tmp_path / "empty.txt"
    p2.write_text("#version: 0.2\n\n", encoding="utf-8")
    with pytest.raises(ValueError, match="no merge rules"):
        load_merges_file(str(p2))


def test_get_tokenizer_honors_merges_env(tmp_path, monkeypatch):
    path = _write_merges(tmp_path)
    monkeypatch.setenv(MERGES_FILE_ENV, path)
    t = get_tokenizer()
    assert isinstance(t, ByteLevelBPETokenizer)
    assert [t._tok_of[i] for i in t.encode(" the")] == ["Ġthe"]
    # vendored table does NOT have this exact vocab layout — proves the
    # file actually drove construction
    assert ByteLevelBPETokenizer().encode(" the") != t.encode(" the") or (
        len(t._tok_of) == 256 + 7
    )
    assert len(t._tok_of) == 256 + 7


def test_load_merges_file_keeps_hash_symbol_merges(tmp_path):
    """Released merges tables contain legitimate pairs whose left symbol
    starts with '#' ('# #', '## #', ...); only a FIRST-LINE #version
    header may be skipped — a generic comment rule would silently drop
    those merges and shift every later rank."""
    p = tmp_path / "merges.txt"
    p.write_text(
        "#version: 0.2\n# #\n## #\nĠ t\n", encoding="utf-8"
    )
    merges = load_merges_file(str(p))
    assert merges == [("#", "#"), ("##", "#"), ("Ġ", "t")]
    # a '#'-ish line later in the file is data, not a comment
    tok = ByteLevelBPETokenizer(merges)
    ids = tok.encode("##")
    assert [tok._tok_of[i] for i in ids] == ["##"]
