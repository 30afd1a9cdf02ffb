"""Context-section rendering (SURVEY.md §2.8 D8, steps W1–W6).

The most intricate pure logic in the reference
(``/root/reference/src/vectra_py/local_document_result.py:26-183``):
given one document's text + its top-k chunks, produce token-budgeted
text sections for an LLM prompt. Deterministic given (chunks, text,
tokenizer) — and tiny (≤ 50 chunks × ≤ 10 docs per query) — so it runs
driver-side on the collected top-k, deliberately OUTSIDE Spark
(SURVEY.md §3.3: only the ranking is distributed).

Reference bugs fixed toward intent (SURVEY.md §2.9.9):
- the greedy packer's last partial section is appended + score-normalized
  (the reference drops it — ``local_document_result.py:84-98``)
- connector ``token_count`` is the token COUNT, not the token list
  (``:120-126``)
"""

from __future__ import annotations

from dataclasses import dataclass

from vectra_py_spark.text.tokenizers import Tokenizer

__all__ = ["RenderedSection", "ScoredChunk", "render_sections"]

_CONNECTOR = "\n\n...\n\n"
_MIN_PAD_BUDGET = 40  # W6: only pad when > 40 tokens remain


@dataclass
class ScoredChunk:
    text: str
    score: float
    start_pos: int
    end_pos: int  # inclusive
    token_count: int = 0


@dataclass
class RenderedSection:
    text: str
    token_count: int
    score: float


def render_sections(
    doc_text: str,
    chunks: list[ScoredChunk],
    tokenizer: Tokenizer,
    max_tokens: int = 2000,
    max_sections: int = 1,
) -> list[RenderedSection]:
    """W1–W6 over one document's retrieved chunks."""
    doc_tokens = tokenizer.encode(doc_text)

    # W1: whole document fits → one section, score 1.0
    if len(doc_tokens) <= max_tokens:
        return [RenderedSection(doc_text, len(doc_tokens), 1.0)]

    # W2: re-slice chunk text from doc text (positions are authoritative);
    # drop chunks over budget; sort by position.
    sliced: list[ScoredChunk] = []
    for c in chunks:
        text = doc_text[c.start_pos : c.end_pos + 1]
        n = len(tokenizer.encode(text))
        if n <= max_tokens:
            sliced.append(ScoredChunk(text, c.score, c.start_pos, c.end_pos, n))
    sliced.sort(key=lambda c: c.start_pos)

    # W3: nothing fits → truncate the top-scoring chunk to max_tokens.
    if not sliced and chunks:
        top = max(chunks, key=lambda c: c.score)
        tokens = tokenizer.encode(doc_text[top.start_pos : top.end_pos + 1])
        text = tokenizer.decode(tokens[:max_tokens])
        return [RenderedSection(text, min(len(tokens), max_tokens), top.score)]
    if not sliced:
        return []

    # W4: greedy pack position-ordered chunks into sections ≤ max_tokens;
    # section score = mean of member chunk scores. FIX §2.9.9: the final
    # partial section is kept and normalized too.
    sections: list[list[ScoredChunk]] = []
    current: list[ScoredChunk] = []
    current_tokens = 0
    for c in sliced:
        if current and current_tokens + c.token_count > max_tokens:
            sections.append(current)
            current, current_tokens = [], 0
        current.append(c)
        current_tokens += c.token_count
    if current:
        sections.append(current)

    scored = [
        (sum(c.score for c in sec) / len(sec), sec) for sec in sections
    ]

    # W5: rank sections by score, keep max_sections; merge char-adjacent
    # chunks (end_pos + 1 == start_pos) inside each kept section.
    scored.sort(key=lambda s: -s[0])
    kept = scored[:max_sections]

    out: list[RenderedSection] = []
    for score, sec in kept:
        merged: list[ScoredChunk] = []
        for c in sec:
            if merged and merged[-1].end_pos + 1 == c.start_pos:
                prev = merged[-1]
                merged[-1] = ScoredChunk(
                    prev.text + c.text,
                    max(prev.score, c.score),
                    prev.start_pos,
                    c.end_pos,
                    prev.token_count + c.token_count,
                )
            else:
                merged.append(c)

        # W6: connectors between non-adjacent chunks (token_count = real
        # count, FIX §2.9.9), then pad leftover budget with surrounding
        # document text: ≤ budget/2 before, the rest after.
        connector_tokens = len(tokenizer.encode(_CONNECTOR))
        parts: list[str] = []
        used = 0
        for i, c in enumerate(merged):
            if i > 0:
                parts.append(_CONNECTOR)
                used += connector_tokens
            parts.append(c.text)
            used += c.token_count

        budget = max_tokens - used
        if budget > _MIN_PAD_BUDGET and merged:
            before_budget = budget // 2
            first, last = merged[0], merged[-1]
            pre_tokens = tokenizer.encode(doc_text[: first.start_pos])
            pre_text = tokenizer.decode(pre_tokens[-before_budget:]) if before_budget else ""
            used += min(len(pre_tokens), before_budget)
            after_budget = budget - min(len(pre_tokens), before_budget)
            post_tokens = tokenizer.encode(doc_text[last.end_pos + 1 :])
            post_text = tokenizer.decode(post_tokens[:after_budget]) if after_budget > 0 else ""
            used += min(len(post_tokens), max(after_budget, 0))
            parts = [pre_text, *parts, post_text]

        out.append(RenderedSection("".join(parts), used, score))
    return out
