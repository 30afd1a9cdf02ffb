"""Splitter invariants + goldens (SURVEY.md §5.2/5.3, FIXTURES.md §4)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectra_py_spark.text.splitter import (
    SplitterConfig,
    TextSplitter,
    split_documents,
)
from vectra_py_spark.text.tokenizers import DeterministicTokenizer

TOK = DeterministicTokenizer()


def make(chunk_size=32, overlap=0, keep=True, doc_type=None):
    return TextSplitter(
        SplitterConfig(
            chunk_size=chunk_size,
            chunk_overlap=overlap,
            keep_separators=keep,
            doc_type=doc_type,
        ),
        DeterministicTokenizer(),
    )


def test_empty_and_tiny():
    assert make().split("") == []
    chunks = make().split("hello world")
    assert len(chunks) == 1
    assert chunks[0].text == "hello world"
    assert chunks[0].start_pos == 0
    assert chunks[0].end_pos == 10


def test_positions_reslice_exactly():
    """keep_separators=True ⇒ text == source[start:end+1] for every chunk
    (positions feed metadata; W2 re-slices by them)."""
    text = "Para one has words.\n\nPara two is here.\n\nPara three ends.\n\n" * 20
    chunks = make(chunk_size=16).split(text)
    assert len(chunks) > 1
    for c in chunks:
        assert text[c.start_pos : c.end_pos + 1] == c.text


def test_chunks_within_budget():
    text = ("word " * 200 + "\n\n") * 5
    for c in make(chunk_size=32).split(text):
        assert len(c.tokens) <= 32


def test_no_alnum_free_chunks():
    text = "real text\n\n!!!\n\n###\n\nmore text"
    for c in make(chunk_size=4).split(text):
        assert any(ch.isalnum() for ch in c.text)


def test_greedy_packing_merges_small_parts():
    text = "a b\n\nc d\n\ne f\n\ng h"
    chunks = make(chunk_size=100).split(text)
    assert len(chunks) == 1  # everything packs into one chunk
    assert chunks[0].text == text  # keep_separators join reproduces source


def test_overlap_tokens():
    text = ("alpha beta gamma " * 20 + "\n\n") * 4
    chunks = make(chunk_size=32, overlap=4).split(text)
    assert len(chunks) >= 2
    assert chunks[0].start_overlap == []
    assert chunks[1].start_overlap == chunks[0].tokens[-4:]
    assert chunks[0].end_overlap == chunks[1].tokens[:4]
    assert chunks[-1].end_overlap == []


def test_doc_type_separators_py():
    code = "import os\n\n\nclass Foo:\n    pass\n\ndef bar():\n    return 1\n" * 30
    chunks = make(chunk_size=48, doc_type="py").split(code)
    assert len(chunks) > 1
    for c in chunks:
        assert code[c.start_pos : c.end_pos + 1] == c.text


def test_separatorless_halving():
    text = "x" * 50 + "y" * 5000  # no separators at all
    chunks = make(chunk_size=16).split(text)
    assert chunks, "halving base case must still emit chunks"
    for c in chunks:
        assert len(c.tokens) <= 16
        assert text[c.start_pos : c.end_pos + 1] == c.text


def test_config_validation():
    with pytest.raises(ValueError):
        SplitterConfig(chunk_size=0)
    with pytest.raises(ValueError):
        SplitterConfig(chunk_size=10, chunk_overlap=11)


@settings(max_examples=30, deadline=None)
@given(
    st.text(alphabet="ab \n.!", min_size=0, max_size=400),
    st.integers(min_value=4, max_value=64),
)
def test_property_reslice_and_budget(text, chunk_size):
    sp = make(chunk_size=chunk_size)
    for c in sp.split(text):
        assert text[c.start_pos : c.end_pos + 1] == c.text
        assert len(c.tokens) <= chunk_size
        assert any(ch.isalnum() for ch in c.text)


def test_split_documents_spark(spark):
    rows = [
        ("d1", "Header one.\n\nBody text here with words.\n\nMore body.", "md"),
        ("d2", "def f():\n    return 1\n\ndef g():\n    return 2", "py"),
        ("d3", None, None),
    ]
    df = spark.createDataFrame(rows, ["document_id", "text", "doc_type"])
    out = split_documents(
        df, doc_type_col="doc_type", chunk_size=16, keep_separators=True
    ).collect()
    assert {r.document_id for r in out} == {"d1", "d2"}  # null text skipped
    originals = {r[0]: r[1] for r in rows if r[1]}
    for r in out:
        src = originals[r.document_id]
        assert src[r.start_pos : r.end_pos + 1] == r.text
        assert r.n_tokens <= 16


def test_doc_type_separators_md():
    doc = (
        "# Guide\n\nIntro paragraph with several words here.\n"
        "\n## Install\n\nRun the installer and follow prompts.\n"
        "\n## Usage\n\nCall the function with arguments.\n" * 10
    )
    chunks = make(chunk_size=24, doc_type="md").split(doc)
    assert len(chunks) > 1
    for c in chunks:
        assert doc[c.start_pos : c.end_pos + 1] == c.text
        assert len(c.tokens) <= 24
    # heading ladder is used: keep_separators attaches "\n## " to the
    # END of the preceding part, so later chunks begin right after it
    boundary_hits = sum(
        1
        for c in chunks[1:]
        if doc[max(0, c.start_pos - 4) : c.start_pos] == "\n## "
    )
    assert boundary_hits > 0


def test_doc_type_separators_html():
    doc = (
        "<body><h1>Title</h1><p>First paragraph text here.</p>"
        "<div>Second block with more words.</div>"
        "<p>Third block closes out.</p></body>" * 20
    )
    chunks = make(chunk_size=24, doc_type="html").split(doc)
    assert len(chunks) > 1
    for c in chunks:
        assert doc[c.start_pos : c.end_pos + 1] == c.text
        assert len(c.tokens) <= 24


def test_doc_type_alias_resolution():
    from vectra_py_spark.text.splitter import SEPARATORS_BY_DOC_TYPE

    assert SEPARATORS_BY_DOC_TYPE["typescript"] == SEPARATORS_BY_DOC_TYPE["ts"]
    assert SEPARATORS_BY_DOC_TYPE["csharp"] == SEPARATORS_BY_DOC_TYPE["c#"]
    assert SEPARATORS_BY_DOC_TYPE["python"] == SEPARATORS_BY_DOC_TYPE["py"]
    cfg = SplitterConfig(doc_type="unknown-type")
    from vectra_py_spark.text.splitter import DEFAULT_SEPARATORS

    assert cfg.separators == DEFAULT_SEPARATORS


def test_single_space_tokenizer_regime_is_sql_predictable():
    """The chunk_spans_simple regime: with the count-only
    SingleSpaceTokenizer, single-spaced text >48 chars, K=8, the REAL
    splitter yields groups of floor((K+1)/2)=4 words, alnum-guarded,
    with exact char spans."""
    from vectra_py_spark.text.splitter import (
        SingleSpaceTokenizer,
        SplitterConfig,
        TextSplitter,
    )

    text = "alpha beta !! gamma delta epsilon zeta eta theta iota kappa"
    assert len(text) > 48
    sp = TextSplitter(
        SplitterConfig(chunk_size=8, chunk_overlap=0, keep_separators=False),
        tokenizer=SingleSpaceTokenizer(),
    )
    chunks = sp.split(text)
    # '!!' dropped by the P16 guard; 10 words → 4 + 4 + 2
    assert [c.text for c in chunks] == [
        "alpha beta gamma delta",
        "epsilon zeta eta theta",
        "iota kappa",
    ]
    assert [len(c.tokens) for c in chunks] == [4, 4, 2]
    for c in chunks:
        # spans index the ORIGINAL text; re-slicing covers the words
        assert text[c.start_pos] == c.text[0]
        assert text[c.end_pos] == c.text[-1]
    assert chunks[0].start_pos == 0
    assert chunks[0].end_pos == text.index("delta") + len("delta") - 1

    with pytest.raises(ValueError, match="unknown tokenizer"):
        from vectra_py_spark.text.splitter import split_documents

        split_documents(None, tokenizer="nope")

    # count-only tokenizer cannot supply overlap context — must refuse
    # on the driver, not attach all-1 placeholder overlaps (ADVICE r7)
    with pytest.raises(ValueError, match="count-only"):
        from vectra_py_spark.text.splitter import split_documents

        split_documents(None, tokenizer="space", chunk_overlap=8)
