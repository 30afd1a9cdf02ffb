"""Tokenizer surface (SURVEY.md §2.6 T5/T6).

The reference wraps tiktoken (``gpt3_tokenizer.py:5-13``) and a HF
tokenizer (``all_MiniLM_L6_v2_tokenizer.py`` — broken as shipped,
§2.9.7: per-char encoding of plain strings, unimplemented decode; we
implement the intent: string → subword-ish ids, decode returns text).

Neither tiktoken nor transformers is installed in this environment, so
the default is :class:`ByteLevelBPETokenizer` — a REAL byte-level BPE
with the published GPT-2 mechanics (byte→unicode alphabet, pretoken
regex, lowest-rank pair merge loop, lossless decode), driven by a
vendored merge table trained on the embedded seed corpus below. Token
IDS differ from any released model (the real vocab data files aren't in
this container), but the ALGORITHM is exact — drop in a real merges
file and nothing else changes. ``get_tokenizer("gpt-3.5-turbo")``
upgrades to tiktoken when available.

Executor usage: tokenizers are constructed lazily per executor inside
pandas UDFs (never pickled with state) — the classes here are cheap to
build and hold no network/model resources; encode caches per-pretoken
results so cost scales with DISTINCT words per worker, not total.
"""

from __future__ import annotations

import hashlib
import os
import re
from functools import lru_cache
from typing import Protocol

__all__ = [
    "Tokenizer",
    "DeterministicTokenizer",
    "ByteLevelBPETokenizer",
    "TiktokenTokenizer",
    "HFTokenizer",
    "get_tokenizer",
    "bytes_to_unicode",
    "gpt2_byte_order",
    "train_bpe_merges",
    "load_merges_file",
]

#: Env var pointing at a released BPE merges file (GPT-2 ``merges.txt``
#: format). When set, :func:`get_tokenizer` drives the byte-level BPE
#: with the real released merge table, so chunk boundaries / n_tokens
#: match a production deployment exactly. (The released file itself is
#: not vendored here — this container has no network — but the loader
#: accepts it verbatim, header and all.)
MERGES_FILE_ENV = "VECTRA_BPE_MERGES"


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


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """The published GPT-2 byte→printable-unicode alphabet: every one of
    the 256 byte values gets a visible character so merge tables are
    plain text. Printable ASCII/Latin-1 map to themselves; the rest map
    to 256+n. Public algorithm (shipped with GPT-2's encoder)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def gpt2_byte_order() -> list[int]:
    """The byte values in GPT-2 vocab-id order: printable ranges first,
    then the remaining bytes in the order :func:`bytes_to_unicode`
    appends them. GPT-2's released ``vocab.json`` assigns base-symbol
    ids 0–255 in exactly this construction order (e.g. ``"\\n"`` — byte
    10, the 11th appended byte after the 188 printables — is id 198),
    and merge outputs get ``256 + rank``. Assigning our base ids the
    same way makes :class:`ByteLevelBPETokenizer` ids exactly GPT-2's
    once the released ``merges.txt`` is loaded."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    bs += [b for b in range(256) if b not in set(bs)]
    return bs


def train_bpe_merges(corpus: str, n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training (count adjacent pairs, merge the most
    frequent, repeat) over byte-level symbols. Deterministic: ties break
    by (count, pair) ordering. Used once to produce
    :data:`VENDORED_MERGES`; kept so the vendored table is reproducible
    (``test_vendored_merges_reproducible``)."""
    b2u = bytes_to_unicode()
    words: dict[tuple[str, ...], int] = {}
    for piece in _PRETOKEN_RE.findall(corpus):
        key = tuple(b2u[b] for b in piece.encode("utf-8"))
        words[key] = words.get(key, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, c in words.items():
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for w, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
    return merges


# Seed corpus for the vendored merge table: ordinary technical English,
# written for this repo (weighted toward function words and common
# subwords so frequent English merges to few tokens and rare strings
# split fine-grained, like any released BPE vocab does).
SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog and the dog sleeps in "
    "the sun by the river while the birds sing in the trees all day long "
    "this is the story of a system that reads data and writes data and "
    "counts the words in all of the documents that it has seen so far "
    "when a query arrives the engine builds a plan for the query and the "
    "plan is sent to the workers and each worker reads its part of the "
    "data and computes a partial result and the partial results are "
    "merged into one final answer that is returned to the user quickly "
    "a table is stored as files and each file holds many rows of data "
    "and each row has columns and the columns have types such as number "
    "and string and the engine can filter rows and group rows and join "
    "one table with another table on a shared key column very fast "
    "people write text in many languages and the text is split into "
    "small pieces called tokens and the tokens are counted and the "
    "counts are used to pack pieces into chunks of a bounded size "
    "it is important that the same input always gives the same output "
    "so that tests can check the results and the results do not change "
    "over time this makes the whole system easy to trust and to fix "
    "some words appear often such as that with from have been were will "
    "would could should there their which what when where who how why "
    "because before after between under about into through during for "
    "not all work can be done at once so the work is divided into parts "
    "and the parts run at the same time on many machines in a cluster "
    "reading writing searching sorting counting grouping joining merging "
    "the cost of a plan depends on how much data moves between machines "
    "and a good plan moves as little data as possible and keeps the "
    "computation close to where the data lives for the best performance"
)

# Trained once by ``train_bpe_merges(SEED_CORPUS, 256)`` and embedded so
# executors pay zero training cost; reproducibility is test-asserted.
VENDORED_MERGES: list[tuple[str, str]] = [
    ('Ġ', 't'), ('Ġ', 'a'), ('Ġt', 'h'), ('Ġth', 'e'),
    ('i', 'n'), ('Ġ', 's'), ('n', 'd'), ('Ġ', 'w'),
    ('Ġa', 'nd'), ('e', 's'), ('e', 'r'), ('Ġ', 'c'),
    ('Ġ', 'o'), ('Ġ', 'd'), ('Ġ', 'p'), ('o', 'r'),
    ('a', 't'), ('Ġ', 'r'), ('a', 'n'), ('e', 'n'),
    ('Ġ', 'f'), ('Ġ', 'b'), ('o', 'u'), ('Ġ', 'm'),
    ('Ġ', 'in'), ('Ġ', 'i'), ('l', 'e'), ('in', 'g'),
    ('Ġw', 'h'), ('t', 's'), ('c', 'h'), ('e', 'a'),
    ('Ġt', 'o'), ('e', 'd'), ('Ġo', 'f'), ('Ġi', 's'),
    ('Ġd', 'at'), ('Ġdat', 'a'), ('Ġ', 'h'), ('o', 'w'),
    ('i', 't'), ('d', 's'), ('a', 'r'), ('Ġw', 'or'),
    ('Ġth', 'at'), ('Ġo', 'n'), ('Ġc', 'o'), ('Ġb', 'e'),
    ('u', 'm'), ('s', 't'), ('m', 'e'), ('Ġp', 'ar'),
    ('Ġin', 't'), ('Ġint', 'o'), ('Ġd', 'o'), ('Ġc', 'ou'),
    ('Ġa', 's'), ('Ġ', 'l'), ('v', 'es'), ('u', 't'),
    ('r', 'e'), ('l', 'l'), ('Ġwor', 'k'), ('Ġs', 'o'),
    ('Ġr', 'ow'), ('Ġr', 'es'), ('Ġres', 'u'), ('Ġresu', 'l'),
    ('Ġp', 'l'), ('Ġpl', 'an'), ('Ġh', 'a'), ('Ġf', 'i'),
    ('Ġcou', 'n'), ('Ġ', 'q'), ('Ġq', 'u'), ('Ġ', 'g'),
    ('Ġ', 'ea'), ('v', 'er'), ('p', 'ut'), ('c', 'k'),
    ('b', 'le'), ('a', 'l'), ('Ġw', 'r'), ('Ġwr', 'it'),
    ('Ġt', 'a'), ('Ġta', 'ble'), ('Ġs', 'u'), ('Ġs', 't'),
    ('Ġs', 'a'), ('Ġsa', 'me'), ('Ġrow', 's'), ('Ġresul', 'ts'),
    ('Ġr', 'ea'), ('Ġpar', 't'), ('Ġm', 'an'), ('Ġman', 'y'),
    ('Ġm', 'a'), ('Ġf', 'or'), ('Ġea', 'ch'), ('Ġco', 'l'),
    ('Ġcol', 'um'), ('Ġcolum', 'n'), ('Ġc', 'h'), ('Ġc', 'an'),
    ('Ġa', 're'), ('Ġa', 'll'), ('Ġ', 'u'), ('Ġ', 'n'),
    ('Ġ', 'j'), ('r', 'ou'), ('p', 's'), ('o', 't'),
    ('l', 'd'), ('i', 'ves'), ('er', 'e'), ('e', 'en'),
    ('Ġwork', 'er'), ('Ġwor', 'ds'), ('Ġwh', 'o'), ('Ġwh', 'i'),
    ('Ġwh', 'ere'), ('Ġwh', 'en'), ('Ġw', 'it'), ('Ġwit', 'h'),
    ('Ġu', 's'), ('Ġto', 'k'), ('Ġtok', 'en'), ('Ġtoken', 's'),
    ('Ġth', 'i'), ('Ġthi', 's'), ('Ġt', 'i'), ('Ġti', 'me'),
    ('Ġt', 'e'), ('Ġte', 'x'), ('Ġtex', 't'), ('Ġsu', 'ch'),
    ('Ġst', 'or'), ('Ġs', 'y'), ('Ġsy', 'st'), ('Ġsyst', 'e'),
    ('Ġsyste', 'm'), ('Ġs', 'h'), ('Ġrea', 'ds'), ('Ġqu', 'i'),
    ('Ġqui', 'ck'), ('Ġqu', 'er'), ('Ġquer', 'y'), ('Ġpart', 'i'),
    ('Ġparti', 'al'), ('Ġpar', 'ts'), ('Ġp', 'i'), ('Ġpi', 'e'),
    ('Ġpie', 'c'), ('Ġpiec', 'es'), ('Ġon', 'e'), ('Ġo', 'ver'),
    ('Ġn', 'ot'), ('Ġma', 'ch'), ('Ġmach', 'in'), ('Ġmachin', 'es'),
    ('Ġm', 'o'), ('Ġmo', 'ves'), ('Ġm', 'er'), ('Ġmer', 'g'),
    ('Ġj', 'o'), ('Ġjo', 'in'), ('Ġi', 't'), ('Ġha', 'v'),
    ('Ġhav', 'e'), ('Ġha', 's'), ('Ġh', 'ow'), ('Ġg', 'rou'),
    ('Ġgrou', 'p'), ('Ġfi', 'l'), ('Ġdo', 'g'), ('Ġcoun', 'ts'),
    ('Ġcoun', 't'), ('Ġcolumn', 's'), ('Ġco', 'm'), ('Ġcom', 'put'),
    ('Ġc', 'l'), ('Ġbe', 't'), ('Ġbet', 'w'), ('Ġbetw', 'een'),
    ('Ġa', 't'), ('Ġa', 'n'), ('Ġ', 'k'), ('Ġk', 'e'),
    ('Ġ', 'en'), ('Ġen', 'g'), ('Ġeng', 'in'), ('Ġengin', 'e'),
    ('u', 'st'), ('u', 'r'), ('u', 'n'), ('t', 'er'),
    ('s', 'e'), ('ou', 'ld'), ('or', 't'), ('o', 'n'),
    ('l', 'ds'), ('i', 'r'), ('f', 'or'), ('ea', 'r'),
    ('e', 'ps'), ('c', 'e'), ('an', 'g'), ('a', 'y'),
    ('Ġwrit', 'ing'), ('Ġwrit', 'es'), ('Ġwrit', 'e'), ('Ġworker', 's'),
    ('Ġwho', 'le'), ('Ġwhi', 'le'), ('Ġwhi', 'ch'), ('Ġwh', 'y'),
    ('Ġwh', 'at'), ('Ġw', 'ould'), ('Ġw', 'i'), ('Ġwi', 'll'),
    ('Ġw', 'ere'), ('Ġus', 'er'), ('Ġus', 'ed'), ('Ġu', 'nd'),
    ('Ġund', 'er'), ('Ġthe', 're'), ('Ġthe', 'ir'), ('Ġth', 'rou'),
    ('Ġthrou', 'g'), ('Ġthroug', 'h'), ('Ġt', 'y'), ('Ġty', 'p'),
    ('Ġtyp', 'es'), ('Ġt', 're'), ('Ġtre', 'es'), ('Ġt', 'r'),
    ('Ġtr', 'ust'), ('Ġt', 'es'), ('Ġtes', 'ts'), ('Ġsu', 'n'),
    ('Ġstor', 'y'), ('Ġstor', 'ed'), ('Ġst', 'r'), ('Ġstr', 'ing'),
    ('Ġso', 'me'), ('Ġsh', 'ould'), ('Ġsh', 'ar'), ('Ġshar', 'ed'),
    ('Ġs', 'p'), ('Ġsp', 'l'), ('Ġspl', 'it'), ('Ġs', 'ort'),
    ('Ġsort', 'ing'), ('Ġs', 'm'), ('Ġsm', 'a'), ('Ġsma', 'll'),
]


def load_merges_file(path: str) -> list[tuple[str, str]]:
    """Parse a released BPE merges file (the GPT-2 ``merges.txt``
    format: optional ``#version`` header, then one space-separated
    symbol pair per line, rank = line order). ONLY a first-line
    ``#version`` header and blank lines are skipped — released tables
    contain legitimate merges whose left symbol starts with ``#``
    (``# #``, ``## #``, …), so a generic comment rule would silently
    drop them and shift every later rank (HF's tokenizers parser skips
    only the version header too). A malformed line raises with its
    line number so a truncated download fails loudly rather than
    mis-ranking every later merge."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for lineno, raw in enumerate(fh, start=1):
            line = raw.rstrip("\n")
            if not line:
                continue
            if lineno == 1 and line.startswith("#version"):
                continue
            parts = line.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"{path}:{lineno}: expected 'left right', got {line!r}"
                )
            merges.append((parts[0], parts[1]))
    if not merges:
        raise ValueError(f"{path}: no merge rules found")
    return merges


@lru_cache(maxsize=4)
def _merges_from_file_cached(path: str, mtime_ns: int) -> tuple[tuple[str, str], ...]:
    # mtime participates in the key so an edited file is re-read.
    return tuple(load_merges_file(path))


class ByteLevelBPETokenizer:
    """Real byte-level BPE (T5 parity path): GPT-2's exact encode/decode
    mechanics over a pluggable merge table.

    encode: pretoken regex → utf-8 bytes → unicode alphabet → merge the
    lowest-rank adjacent pair until none applies → vocab ids
    (256 base symbols, then one id per merge output, in merge order).
    decode is lossless for ANY id sequence: ids → symbol strings →
    reverse byte map → utf-8 (``decode(encode(x)) == x``, no in-process
    vocab recording needed — strictly stronger than the md5 stand-in).
    """

    def __init__(self, merges: list[tuple[str, str]] | None = None) -> None:
        merges = VENDORED_MERGES if merges is None else list(merges)
        self._ranks = {pair: r for r, pair in enumerate(merges)}
        b2u = bytes_to_unicode()
        self._u2b = {v: k for k, v in b2u.items()}
        self._b2u = b2u
        # Base ids in GPT-2 vocab order (not raw byte order): with the
        # released merges.txt loaded, encode() ids are exactly GPT-2's.
        vocab = [b2u[b] for b in gpt2_byte_order()]
        vocab.extend(a + b for a, b in merges)
        self._tok_of = vocab
        self._id_of = {tok: i for i, tok in enumerate(vocab)}
        self._cache: dict[str, list[int]] = {}

    @classmethod
    def from_merges_file(cls, path: str) -> "ByteLevelBPETokenizer":
        """Build from a released merges file (GPT-2 ``merges.txt``
        format). Parsed tables are process-cached so per-executor lazy
        construction inside pandas UDFs re-reads the file at most once
        per worker, not once per batch."""
        merges = _merges_from_file_cached(path, os.stat(path).st_mtime_ns)
        return cls(list(merges))

    def _bpe(self, symbols: tuple[str, ...]) -> list[str]:
        word = list(symbols)
        while len(word) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(word) - 1):
                r = self._ranks.get((word[i], word[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            merged = word[best_i] + word[best_i + 1]
            # merge every occurrence of this exact pair, left to right
            out: list[str] = []
            i = 0
            pair = (word[best_i], word[best_i + 1])
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        return word

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for piece in _PRETOKEN_RE.findall(text):
            ids = self._cache.get(piece)
            if ids is None:
                symbols = tuple(self._b2u[b] for b in piece.encode("utf-8"))
                ids = [self._id_of[tok] for tok in self._bpe(symbols)]
                if len(self._cache) < 1 << 20:  # bound worker memory
                    self._cache[piece] = ids
            out.extend(ids)
        return out

    def decode(self, tokens: list[int]) -> str:
        text = "".join(self._tok_of[int(t)] for t in tokens)
        return bytes(self._u2b[ch] for ch in text).decode(
            "utf-8", errors="replace"
        )

    def count(self, text: str) -> int:
        return len(self.encode(text))


class HFTokenizer:
    """T6: HF ``AutoTokenizer`` wrapper (reference
    ``all_MiniLM_L6_v2_tokenizer.py:5-23``) with the §2.9.7 bug fixed:
    the reference's ``encode`` treated any len>1 *string* as a list of
    strings, so plain strings were encoded per-character, and its
    ``decode`` was ``pass``. Here dispatch is by ``isinstance`` — a
    ``str`` encodes as one text, a sequence encodes element-wise — and
    decode returns real text. Import-gated on ``transformers``; the
    contract is pinned by ``tests/test_real_libs.py`` whenever the
    library is present."""

    def __init__(
        self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2"
    ) -> None:
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(model_name)

    def encode(
        self, text: "str | list[str]"
    ) -> "list[int] | list[list[int]]":
        if isinstance(text, str):  # the §2.9.7 fix: str is ONE text
            return self._tok.encode(text, add_special_tokens=False)
        return [
            self._tok.encode(t, add_special_tokens=False) for t in text
        ]

    def decode(self, tokens: list[int]) -> str:
        return self._tok.decode(tokens)

    def count(self, text: str) -> int:
        if not isinstance(text, str):
            # len(encode(list)) would be the TEXT count, a plausible-
            # looking wrong number — refuse instead
            raise TypeError("count() takes one text; got a sequence")
        return len(self.encode(text))


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
    """Best available tokenizer, in fidelity order: for a hub-path
    model name (contains ``/``) the HF AutoTokenizer (reference T6),
    for other model names tiktoken (reference T5 exactly) — each when
    its library is installed; else a released merges file named by
    ``$VECTRA_BPE_MERGES`` (real deployment boundaries), else the
    vendored trained table (identical behavior across
    driver/executors)."""
    if model:
        if "/" in model:  # HF hub path, e.g. sentence-transformers/...
            try:
                return HFTokenizer(model)
            except ImportError:
                # A hub path names a SPECIFIC tokenizer; substituting
                # byte-level BPE changes counts and boundaries, so the
                # fallback must not be silent (unlike the documented
                # tiktoken→vendored downgrade, which is this
                # container's normal mode).
                import warnings

                warnings.warn(
                    f"transformers not installed — falling back from "
                    f"HF tokenizer {model!r} to the byte-level BPE; "
                    f"token counts and boundaries will differ",
                    stacklevel=2,
                )
        else:
            try:
                return TiktokenTokenizer(model)
            except ImportError:
                pass
    merges_path = os.environ.get(MERGES_FILE_ENV)
    if merges_path:
        return ByteLevelBPETokenizer.from_merges_file(merges_path)
    return ByteLevelBPETokenizer()
