"""render_sections goldens: W1 doc-fits, W4 packing (+ last-section fix),
W5 adjacent-merge, W6 connectors/padding (FIXTURES.md §4)."""

from __future__ import annotations

from vectra_py_spark.render import ScoredChunk, render_sections
from vectra_py_spark.text.tokenizers import DeterministicTokenizer

TOK = DeterministicTokenizer()

DOC = (
    "Alpha paragraph with several words inside it. "
    "Beta paragraph continues the story with more words. "
    "Gamma paragraph adds detail about the topic. "
    "Delta paragraph concludes with final thoughts. "
) * 10


def chunk(start, end, score):
    return ScoredChunk(text="", score=score, start_pos=start, end_pos=end)


def test_w1_doc_fits_single_section():
    small = "Tiny document."
    out = render_sections(small, [chunk(0, 5, 0.9)], TOK, max_tokens=2000)
    assert len(out) == 1
    assert out[0].text == small
    assert out[0].score == 1.0
    assert out[0].token_count == len(TOK.encode(small))


def test_w4_last_partial_section_kept():
    # chunks that don't fill max_tokens — the reference dropped this
    # final partial section (§2.9.9); we keep it.
    out = render_sections(
        DOC,
        [chunk(0, 44, 0.9), chunk(46, 95, 0.8)],
        TOK,
        max_tokens=40,
        max_sections=2,
    )
    assert len(out) >= 1
    assert all(s.token_count <= 40 for s in out)


def test_w5_adjacent_chunks_merge():
    # end_pos + 1 == start_pos ⇒ merged into one contiguous span
    out = render_sections(
        DOC, [chunk(0, 44, 0.9), chunk(45, 90, 0.7)], TOK,
        max_tokens=30, max_sections=1,
    )
    assert len(out) == 1
    assert "..." not in out[0].text  # merged, no connector


def test_w6_connector_between_distant_chunks():
    out = render_sections(
        DOC, [chunk(0, 40, 0.9), chunk(400, 440, 0.8)], TOK,
        max_tokens=30, max_sections=1,
    )
    assert len(out) == 1
    assert "\n\n...\n\n" in out[0].text


def test_w6_padding_fills_budget():
    out = render_sections(
        DOC, [chunk(200, 240, 0.9)], TOK, max_tokens=100, max_sections=1
    )
    assert len(out) == 1
    sec = out[0]
    # padded with surrounding doc text: more than the bare chunk
    assert len(sec.text) > 41
    assert DOC[200:241] in sec.text
    assert sec.token_count <= 100


def test_w3_truncate_when_nothing_fits():
    out = render_sections(
        DOC, [chunk(0, len(DOC) - 1, 0.9)], TOK, max_tokens=20, max_sections=1
    )
    assert len(out) == 1
    assert out[0].token_count <= 20


def test_max_sections_ranking():
    out = render_sections(
        DOC,
        [chunk(0, 40, 0.2), chunk(400, 440, 0.95), chunk(800, 840, 0.5)],
        TOK,
        max_tokens=10,
        max_sections=2,
    )
    assert len(out) <= 2
    scores = [s.score for s in out]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] >= 0.9
