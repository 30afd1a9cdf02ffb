"""Real-library gate layer (VERDICT r4 #6).

The container has no tiktoken / transformers / sentence-transformers
and no network, so the import-gated classes (`TiktokenTokenizer`,
`HFTokenizer`, `SentenceTransformerEmbedder`) and the released-merges
path have never run against the real deps. These tests skip cleanly
here and pin the contracts the FIRST time an environment grows the
libraries (or `scripts/fetch_gpt2_merges.py` installs the merge table)
— so gate drift is caught by `pytest`, not by a user.

Hermetic tests at the bottom pin the GPT-2 id-space alignment that
does NOT need any library: base-symbol ids follow GPT-2's vocab order
(construction order of bytes_to_unicode), merged ids are 256+rank.
"""

from __future__ import annotations

import importlib.util
import os
from pathlib import Path

import pytest

from vectra_py_spark.text.tokenizers import (
    ByteLevelBPETokenizer,
    bytes_to_unicode,
    gpt2_byte_order,
)

REPO = Path(__file__).resolve().parents[1]
GPT2_MERGES = REPO / "vectra_py_spark" / "text" / "data" / "gpt2_merges.txt"


def _have(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


def _merges_path() -> str | None:
    env = os.environ.get("VECTRA_BPE_MERGES")
    if env and Path(env).is_file():
        return env
    if GPT2_MERGES.is_file():
        return str(GPT2_MERGES)
    return None


# ---------------------------------------------------------------------------
# Released GPT-2 merges.txt (installed by scripts/fetch_gpt2_merges.py)
# ---------------------------------------------------------------------------
@pytest.mark.skipif(
    _merges_path() is None,
    reason="no released merges.txt installed (run scripts/fetch_gpt2_merges.py)",
)
def test_released_merges_encode_known_gpt2_ids():
    """With the released 50k merge table, our byte-level BPE must emit
    EXACTLY GPT-2's token ids — the famous 'Hello world' -> [15496,
    995], and '\\n' -> [198] (base symbol, id from vocab order)."""
    tok = ByteLevelBPETokenizer.from_merges_file(_merges_path())
    assert tok.encode("Hello world") == [15496, 995]
    assert tok.encode("\n") == [198]
    for s in ("Hello world", "a\nb", "  spaced  out  ", "naïve café"):
        assert tok.decode(tok.encode(s)) == s


@pytest.mark.skipif(
    _merges_path() is None or not _have("tiktoken"),
    reason="needs both the released merges.txt and tiktoken",
)
def test_released_merges_match_tiktoken_gpt2():
    """Cross-check the whole pipeline against tiktoken's gpt2 encoding
    on varied text (ids must agree token-for-token)."""
    import tiktoken

    enc = tiktoken.get_encoding("gpt2")
    tok = ByteLevelBPETokenizer.from_merges_file(_merges_path())
    for s in (
        "Hello world",
        "The quick brown fox jumps over the lazy dog.",
        "unbelievable   whitespace\npatterns\t!",
        "naïve café — ünïcödé",
        "x" * 200,
    ):
        assert tok.encode(s) == enc.encode(s)


# ---------------------------------------------------------------------------
# tiktoken (reference T5)
# ---------------------------------------------------------------------------
@pytest.mark.skipif(not _have("tiktoken"), reason="tiktoken not installed")
def test_tiktoken_gate_dispatch_and_roundtrip():
    from vectra_py_spark.text.tokenizers import (
        TiktokenTokenizer,
        get_tokenizer,
    )

    tok = get_tokenizer("gpt-3.5-turbo")
    assert isinstance(tok, TiktokenTokenizer)
    s = "The engine upgrades to tiktoken when present."
    assert tok.decode(tok.encode(s)) == s
    assert tok.count(s) == len(tok.encode(s))


# ---------------------------------------------------------------------------
# transformers (reference T6 — §2.9.7 dispatch fix)
# ---------------------------------------------------------------------------
@pytest.mark.skipif(
    not _have("transformers"), reason="transformers not installed"
)
def test_hf_gate_str_is_one_text_not_char_list():
    """The reference bug encoded a plain str per-CHARACTER. The fixed
    dispatch must encode 'hello world' as a handful of subwords (not
    11 single-char tokens), encode lists element-wise, and round-trip
    decode."""
    from vectra_py_spark.text.tokenizers import HFTokenizer, get_tokenizer

    tok = get_tokenizer("sentence-transformers/all-MiniLM-L6-v2")
    assert isinstance(tok, HFTokenizer)
    ids = tok.encode("hello world")
    assert 0 < len(ids) <= 4  # subwords, not characters
    both = tok.encode(["hello world", "goodbye"])
    assert both[0] == ids and len(both) == 2
    assert "hello world" in tok.decode(ids).lower()


# ---------------------------------------------------------------------------
# sentence-transformers (E3 intent: true dense vectors)
# ---------------------------------------------------------------------------
@pytest.mark.skipif(
    not _have("sentence_transformers"),
    reason="sentence-transformers not installed",
)
def test_sentence_transformer_gate_shape_and_dtype():
    """Shape/stability contract the DeterministicEmbedder stands in
    for: one 384-dim float vector per text, deterministic across
    calls, non-degenerate norms."""
    import math

    from vectra_py_spark.embeddings import SentenceTransformerEmbedder

    emb = SentenceTransformerEmbedder()
    texts = ["first document", "a second, longer document about spark"]
    vecs = emb.create_embeddings(texts)
    assert len(vecs) == 2
    assert all(len(v) == 384 for v in vecs)
    assert all(isinstance(x, float) for v in vecs for x in v)
    norms = [math.sqrt(sum(x * x for x in v)) for v in vecs]
    assert all(n > 0.1 for n in norms)
    assert emb.create_embeddings(texts) == vecs  # deterministic


# ---------------------------------------------------------------------------
# Hermetic: GPT-2 id-space alignment needs no library
# ---------------------------------------------------------------------------
def test_base_ids_follow_gpt2_vocab_order():
    """Base-symbol ids must follow GPT-2's vocab construction order:
    '!' is id 0, '~' id 93, '¡' id 94, and '\\n' (byte 10, the 11th
    byte appended after the 188 printables) id 198 — so a dropped-in
    released merges.txt yields exactly GPT-2's id space."""
    tok = ByteLevelBPETokenizer()
    b2u = bytes_to_unicode()
    order = gpt2_byte_order()
    assert len(order) == 256 and sorted(order) == list(range(256))
    assert order[0] == ord("!") and order[93] == ord("~")
    assert order[188:199] == list(range(10)) + [10]
    assert tok._id_of["!"] == 0
    assert tok._id_of["~"] == 93
    assert tok._id_of[b2u[ord("¡")]] == 94
    assert tok._id_of[b2u[10]] == 198  # "\n"
    # merged symbols start at 256, in merge-rank order
    first_merge = tok._tok_of[256]
    assert first_merge not in set(b2u.values())


def test_merged_ids_are_256_plus_rank():
    from vectra_py_spark.text.tokenizers import VENDORED_MERGES

    tok = ByteLevelBPETokenizer()
    for rank, (a, b) in enumerate(VENDORED_MERGES[:16]):
        assert tok._id_of[a + b] == 256 + rank
