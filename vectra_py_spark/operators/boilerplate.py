"""Boilerplate removal — main-content extraction from raw HTML, the
step between "crawl fetched a page" and "the quality funnel scores a
document". Navigation, cookie banners, footers, and related-link rails
dominate token counts on real pages; shipping them into a training
corpus wastes the token budget and poisons dedup (every page on a site
shares its chrome). Reference tie-in: the reference converts whole
pages (`document_fetcher.py` markdown path); this operator is the
corpus-scale refinement of that step.

The classifier is the jusText block algorithm (Pomikálek 2011,
"Removing Boilerplate and Duplicate Content from Web Corpora", public
thesis; also the heuristic family of trafilatura/boilerpipe),
re-implemented from the published description with fixed, documented
thresholds:

1. Segment HTML into BLOCKS at block-level tag boundaries
   (p/div/li/h*/td/blockquote/pre/article/section/...), dropping
   script/style/comment content first.
2. Per block compute: char length, LINK DENSITY (chars inside <a> /
   total chars), STOPWORD DENSITY (fraction of words in a fixed
   English function-word list).
3. Context-free classification:
   - link_density > 0.33                     → BAD
   - length < 70: BAD if link_density > 0.2, else SHORT
   - stopword_density ≥ 0.32: GOOD if length > 200, else NEAR_GOOD
   - stopword_density ≥ 0.30                 → NEAR_GOOD
   - otherwise                               → BAD
4. Context pass (chrome clusters with chrome, content with content):
   a NEAR_GOOD block becomes GOOD when its nearest decided neighbour
   on EITHER side is GOOD; a SHORT block only when BOTH are GOOD
   (a short fragment between chrome and content — a cookie banner
   above the article — is chrome). Headings additionally become GOOD
   when a GOOD block follows within the next two blocks.

Everything is deterministic stdlib Python; the Spark surface is a
narrow Arrow-batched ``mapInPandas`` (payload-local, no shuffle —
the same 100 TB shape as every extractor in this repo).
"""

from __future__ import annotations

import html as _html
import re

__all__ = [
    "page_blocks",
    "classify_blocks",
    "extract_main_text",
    "main_content_df",
]

# fixed English function-word list for stopword density (jusText uses
# per-language lists; this is the high-frequency core that separates
# prose from navigation labels)
_STOP = frozenset(
    """a an the and or but if then of to in on at by for with from as is
    are was were be been being it its this that these those he she they
    we you i his her their our your not no so what which who when where
    how all any both each few more most other some such than too very
    can will just should now have has had do does did""".split()
)

MAX_LINK_DENSITY = 0.33
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.30
STOPWORDS_HIGH = 0.32

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<(script|style|noscript)\b.*?</\1\s*>", re.I | re.S)
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:p|div|li|ul|ol|h[1-6]|td|th|tr|table|blockquote|pre|article"
    r"|section|header|footer|nav|aside|main|figure|figcaption|form|br)"
    r"[^>]*>",
    re.I,
)
_HEADING_OPEN_RE = re.compile(r"<h[1-6][^>]*>", re.I)
_A_TEXT_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.I | re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_WORD_RE = re.compile(r"[A-Za-z']+")


def _plain(fragment: str) -> str:
    return _html.unescape(_TAG_RE.sub("", fragment)).strip()


def page_blocks(html_text: str) -> list[dict]:
    """HTML → ordered block dicts with the jusText features:
    text, n_chars, link_density, stopword_density, is_heading."""
    s = _COMMENT_RE.sub("", html_text)
    s = _SCRIPT_RE.sub("", s)
    blocks: list[dict] = []
    pos = 0
    pending_heading = False
    for m in _BLOCK_SPLIT_RE.finditer(s):
        seg = s[pos : m.start()]
        _append_block(blocks, seg, pending_heading)
        pending_heading = bool(_HEADING_OPEN_RE.match(m.group(0)))
        pos = m.end()
    _append_block(blocks, s[pos:], pending_heading)
    return blocks


def _append_block(blocks: list[dict], seg: str, is_heading: bool) -> None:
    text = _plain(seg)
    if not text:
        return
    link_chars = sum(len(_plain(t)) for t in _A_TEXT_RE.findall(seg))
    words = [w.lower() for w in _WORD_RE.findall(text)]
    stop = sum(w in _STOP for w in words)
    blocks.append(
        {
            "text": text,
            "n_chars": len(text),
            "link_density": min(1.0, link_chars / max(1, len(text))),
            "stopword_density": stop / max(1, len(words)),
            "is_heading": is_heading,
        }
    )


def classify_blocks(blocks: list[dict]) -> list[str]:
    """Context-free labels then the context pass; returns one of
    'good'/'bad' per block (intermediate short/near_good resolved)."""
    labels: list[str] = []
    for b in blocks:
        if b["link_density"] > MAX_LINK_DENSITY:
            labels.append("bad")
        elif b["n_chars"] < LENGTH_LOW:
            labels.append("bad" if b["link_density"] > 0.2 else "short")
        elif b["stopword_density"] >= STOPWORDS_HIGH:
            labels.append(
                "good" if b["n_chars"] > LENGTH_HIGH else "near_good"
            )
        elif b["stopword_density"] >= STOPWORDS_LOW:
            labels.append("near_good")
        else:
            labels.append("bad")

    # nearest decided neighbour on each side
    n = len(labels)
    decided_prev: list[str | None] = [None] * n
    decided_next: list[str | None] = [None] * n
    last: str | None = None
    for i in range(n):
        decided_prev[i] = last
        if labels[i] in ("good", "bad"):
            last = labels[i]
    last = None
    for i in range(n - 1, -1, -1):
        decided_next[i] = last
        if labels[i] in ("good", "bad"):
            last = labels[i]

    out: list[str] = []
    for i, lab in enumerate(labels):
        if lab in ("good", "bad"):
            final = lab
        elif lab == "near_good":
            final = (
                "good"
                if decided_prev[i] == "good" or decided_next[i] == "good"
                else "bad"
            )
        else:  # short: both decided neighbours must be good
            final = (
                "good"
                if decided_prev[i] == "good" and decided_next[i] == "good"
                else "bad"
            )
        # heading rescue: a heading directly announcing GOOD content
        # (within the next two blocks) is content
        if (
            final == "bad"
            and blocks[i]["is_heading"]
            and any(
                labels[j] == "good"
                for j in range(i + 1, min(i + 3, n))
            )
        ):
            final = "good"
        out.append(final)
    return out


def extract_main_text(html_text: str) -> tuple[str, int, int]:
    """HTML → (main text, n_blocks_kept, n_blocks): GOOD blocks
    joined with blank lines."""
    blocks = page_blocks(html_text)
    labels = classify_blocks(blocks)
    kept = [
        b["text"] for b, lab in zip(blocks, labels) if lab == "good"
    ]
    return "\n\n".join(kept), len(kept), len(blocks)


def main_content_df(df, html_col: str = "text", url_col: str | None = "url"):
    """(url, html) rows → (url, main_text, n_blocks_kept, n_blocks,
    boiler_ratio): the corpus-scale surface. boiler_ratio is the
    fraction of blocks classified boilerplate — a quality-funnel
    signal in its own right (pages that are ALL chrome drop out with
    ``main_text = ''``). Narrow mapInPandas, payloads never shuffle."""
    import pandas as pd

    cols = [c for c in ((url_col,) if url_col else ()) if c]
    out_fields = (
        (f"{url_col} STRING, " if url_col else "")
        + "main_text STRING, n_blocks_kept INT, n_blocks INT, "
        + "boiler_ratio DOUBLE"
    )

    def run(batches):
        for pdf in batches:
            rows = {c: [] for c in cols}
            rows.update(
                {
                    "main_text": [],
                    "n_blocks_kept": [],
                    "n_blocks": [],
                    "boiler_ratio": [],
                }
            )
            for _, r in pdf.iterrows():
                text, kept, total = extract_main_text(
                    str(r[html_col]) if r[html_col] is not None else ""
                )
                for c in cols:
                    rows[c].append(r[c])
                rows["main_text"].append(text)
                rows["n_blocks_kept"].append(kept)
                rows["n_blocks"].append(total)
                rows["boiler_ratio"].append(
                    1.0 - kept / total if total else 1.0
                )
            yield pd.DataFrame(rows)

    return df.select(*cols, html_col).mapInPandas(run, schema=out_fields)
