"""Tokenizer surface (SURVEY.md §2.6 T5/T6).

The reference wraps tiktoken (``gpt3_tokenizer.py:5-13``) and a HF
tokenizer (``all_MiniLM_L6_v2_tokenizer.py`` — broken as shipped,
§2.9.7: per-char encoding of plain strings, unimplemented decode; we
implement the intent: string → subword-ish ids, decode returns text).

Neither tiktoken nor transformers is installed in this environment, so
the default is :class:`DeterministicTokenizer` — a hermetic BPE-shaped
regex tokenizer (CI-safe, seed-free, reproducible across processes).
``get_tokenizer("gpt-3.5-turbo")`` upgrades to tiktoken when available.

Executor usage: tokenizers are constructed lazily per executor inside
pandas UDFs (never pickled with state) — the classes here are cheap to
build and hold no network/model resources.
"""

from __future__ import annotations

import hashlib
import re
from typing import Protocol

__all__ = ["Tokenizer", "DeterministicTokenizer", "TiktokenTokenizer", "get_tokenizer"]


class Tokenizer(Protocol):
    def encode(self, text: str) -> list[int]: ...

    def decode(self, tokens: list[int]) -> str: ...


# GPT-2/tiktoken-style pretokenization: contractions, words, numbers,
# punctuation runs, whitespace runs. Public pattern shape (the exact
# regex used by BPE tokenizers is published with GPT-2).
_PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-zÀ-ɏ]+| ?\d+| ?[^\sA-Za-z\d]+|\s+"
)


class DeterministicTokenizer:
    """Hermetic, deterministic tokenizer with reversible decode.

    ``encode`` maps each pretoken piece to a stable 31-bit id
    (md5-derived — platform-independent, unlike ``hash()``), recording
    the id→piece mapping so ``decode`` can reconstruct text for any
    token subsequence previously seen in-process (render_sections W6
    pads sections by decoding tail tokens).
    """

    def __init__(self) -> None:
        self._vocab: dict[int, str] = {}

    @staticmethod
    def _piece_id(piece: str) -> int:
        digest = hashlib.md5(piece.encode("utf-8")).digest()
        return int.from_bytes(digest[:4], "big") & 0x7FFFFFFF

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for piece in _PRETOKEN_RE.findall(text):
            tid = self._piece_id(piece)
            self._vocab[tid] = piece
            out.append(tid)
        return out

    def decode(self, tokens: list[int]) -> str:
        return "".join(self._vocab.get(int(t), "�") for t in tokens)

    def count(self, text: str) -> int:
        return len(_PRETOKEN_RE.findall(text))


class TiktokenTokenizer:
    """tiktoken-backed tokenizer (reference T5) — used when installed."""

    def __init__(self, model: str = "gpt-3.5-turbo") -> None:
        import tiktoken

        self._enc = tiktoken.encoding_for_model(model)

    def encode(self, text: str) -> list[int]:
        return self._enc.encode(text, disallowed_special=())

    def decode(self, tokens: list[int]) -> str:
        return self._enc.decode(tokens)

    def count(self, text: str) -> int:
        return len(self.encode(text))


def get_tokenizer(model: str | None = None) -> Tokenizer:
    """Best available tokenizer: tiktoken if installed, else the
    deterministic fallback (identical behavior across driver/executors)."""
    if model:
        try:
            return TiktokenTokenizer(model)
        except ImportError:
            pass
    return DeterministicTokenizer()
