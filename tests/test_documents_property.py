"""Property tests over the round-8 document formats: for ANY text,
writer → reader round-trips exactly (modulo each format's documented
control-character normalization). Hypothesis drives the generators at
full unicode, which is where hand-picked fixtures miss (astral
chars, bidi controls, lone combining marks, NELs)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from vectra_py_spark.operators.doc import doc_extract_text, encode_doc
from vectra_py_spark.operators.office import (
    docx_extract_text,
    encode_docx,
    encode_odt,
    encode_pptx,
    encode_xlsx,
    odt_extract_text,
    pptx_extract_text,
    xlsx_extract_text,
)
from vectra_py_spark.operators.pdf import encode_pdf, pdf_extract_text
from vectra_py_spark.operators.ppt import encode_ppt, ppt_extract_text
from vectra_py_spark.operators.rtf import encode_rtf, rtf_extract_text
from vectra_py_spark.operators.xls import encode_xls, xls_extract_text

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier

# Printable text without the structural separators each writer maps
# (\t/\n/\r) or C0/C1 controls the formats reserve — those have their
# own targeted tests; surrogates excluded (not encodable anywhere) and
# U+FFFE/U+FFFF excluded (invalid in XML 1.0, so the XML-carried
# formats genuinely cannot represent them — a format limit, not a bug).
_plain = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"),
        blacklist_characters="￾￿",
    ),
    min_size=0,
    max_size=40,
)
_paras = st.lists(_plain, min_size=1, max_size=5)


@settings(max_examples=60, deadline=None)
@given(_paras)
def test_docx_any_text(paras):
    assert docx_extract_text(encode_docx(paras)) == "\n".join(paras)


@settings(max_examples=60, deadline=None)
@given(_paras)
def test_odt_any_text(paras):
    assert odt_extract_text(encode_odt(paras)) == "\n".join(paras)


@settings(max_examples=60, deadline=None)
@given(st.lists(_paras, min_size=1, max_size=3))
def test_pptx_any_text(slides):
    assert pptx_extract_text(encode_pptx(slides)) == [
        "\n".join(s) for s in slides
    ]


@settings(max_examples=60, deadline=None)
@given(st.lists(_paras, min_size=1, max_size=3))
def test_legacy_ppt_any_text(slides):
    want = "\n".join(line for s in slides for line in s)
    # .ppt atoms strip trailing NULs by design; mirror that
    want = "\n".join(
        line.rstrip("\x00") for line in want.split("\n")
    )
    assert ppt_extract_text(encode_ppt(slides)) == want


@settings(max_examples=60, deadline=None)
@given(_paras)
def test_legacy_doc_any_text(paras):
    # the .doc writer stores \r paragraph marks; the reader maps them
    # back to \n — other controls are documented normalizations
    assert doc_extract_text(encode_doc(paras)) == "\n".join(paras)


@settings(max_examples=60, deadline=None)
@given(_paras)
def test_rtf_any_text(paras):
    assert rtf_extract_text(encode_rtf(paras)) == "\n".join(paras)


# XLSX/XLS cells: also exclude the tab/newline the row format uses
_cell = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"),
        blacklist_characters="￾￿",
    ),
    min_size=1,
    max_size=20,
)
_grid = st.lists(
    st.lists(_cell, min_size=1, max_size=3), min_size=1, max_size=3
)


@settings(max_examples=40, deadline=None)
@given(_grid)
def test_xlsx_any_text(rows):
    got = xlsx_extract_text(encode_xlsx([rows]))
    assert got == ["\n".join("\t".join(r) for r in rows)]


def _xls_expect(rows):
    # the .xls writer stores numeric-looking cells as NUMBER records;
    # the reader prints them back through float formatting
    out = []
    for r in rows:
        cells = []
        for v in r:
            try:
                f = float(v)
                cells.append(
                    str(int(f)) if f.is_integer() and abs(f) < 1e15
                    else repr(f)
                )
            except ValueError:
                cells.append(v)
        out.append("\t".join(cells))
    return "\n".join(out)


@settings(max_examples=40, deadline=None)
@given(_grid, st.booleans())
def test_legacy_xls_any_text(rows, split):
    got = xls_extract_text(encode_xls([rows], sst_split=split))
    assert got == [_xls_expect(rows)]


# PDF type0 carries arbitrary unicode; type1 is latin-1-bounded
@settings(max_examples=40, deadline=None)
@given(st.lists(_paras, min_size=1, max_size=2), st.booleans())
def test_pdf_type0_any_text(pages, encrypt):
    # PDF line model: empty trailing lines collapse (page_text drops
    # empty segments) — normalize expectation the way the format does
    b = encode_pdf(
        pages, font="type0",
        encrypt="pw" if encrypt else None, encrypt_mode="rc4",
    )
    got = pdf_extract_text(b)
    want = ["\n".join(line for line in lines if line != "") for lines in pages]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(_paras)
def test_any_document_magic_dispatch(paras):
    """extract_any_document agrees with the direct extractors for
    every writer, whatever the text."""
    from vectra_py_spark.sources.documents import extract_any_document

    for enc, kind in (
        (encode_docx, "docx"),
        (encode_rtf, "rtf"),
        (encode_doc, "doc"),
    ):
        k, text = extract_any_document(enc(paras))
        assert k == kind
        assert text == "\n".join(paras)
