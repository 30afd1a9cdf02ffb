"""PDF text extraction: writer/reader round-trips (compressed and
plain), string-syntax edge cases, declared gates (encryption, xref
streams, composite fonts), the ValueError-only malformed contract +
fuzz, the Spark per-page operator with quarantine, probe integration,
and the WARC application/pdf glue."""

import os
import tempfile
import zlib

import numpy as np
import pytest

from vectra_py_spark.operators.pdf import (
    encode_pdf,
    extract_pdf_text_df,
    pdf_extract_text,
    pdf_info,
    synth_pdf,
)
from vectra_py_spark.operators.probe import probe_payload


def test_roundtrip_compressed_and_plain():
    pages = [["alpha beta", "gamma"], ["second page only line"], [""]]
    for compress in (True, False):
        got = pdf_extract_text(encode_pdf(pages, compress=compress))
        assert got[0] == "alpha beta\ngamma"
        assert got[1] == "second page only line"
        assert got[2] == ""
    info = pdf_info(synth_pdf(4, 2))
    assert info == {"version": "1.4", "n_pages": 4}


def test_string_syntax_edge_cases():
    """Escapes, balanced parens, octal, hex strings, TJ arrays, the
    quote operators — hand-built content streams through the real
    lexer."""
    tricky = [
        "parens (nested (deep)) ok",
        "back\\slash and \\(escaped\\)".replace("\\\\", "\\"),
        "tab\there",
    ]
    got = pdf_extract_text(encode_pdf([tricky]))
    assert "nested (deep)" in got[0]
    assert "tab\there" in got[0]

    # hand-built: TJ array with kerning numbers + hex string + ' op
    content = (
        b"BT /F1 12 Tf 72 720 Td [(Hel) -30 (lo)] TJ "
        b"T* <20576F726C64> Tj (next) ' ET"
    )
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    got = pdf_extract_text(body)
    assert got == ["Hello\n World\nnext"]


def test_declared_gates_refuse_loudly():
    p = synth_pdf(1, 1)
    enc = p.replace(b"/Root", b"/Encrypt 9 0 R /Root", 1)
    with pytest.raises(ValueError, match="encrypted"):
        pdf_extract_text(enc)
    # composite font
    t0 = p.replace(b"/Subtype /Type1", b"/Subtype /Type0", 1)
    with pytest.raises(ValueError, match="Type0"):
        pdf_extract_text(t0)
    # exotic filter
    lzw = p.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode", 1)
    with pytest.raises(ValueError, match="LZWDecode"):
        pdf_extract_text(lzw)
    # xref stream marker
    xs = (
        b"%PDF-1.5\n1 0 obj\n<< /Type /XRef /Length 0 >>\nstream\n"
        b"\nendstream\nendobj\nstartxref\n9\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="xref|XRef|trailer"):
        pdf_extract_text(xs)


def test_malformed_contract_and_fuzz():
    p = synth_pdf(2, 2)
    with pytest.raises(ValueError):
        pdf_extract_text(b"")
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_extract_text(b"PK\x03\x04zipfile")
    for cut in (8, 40, len(p) // 3, len(p) // 2):
        with pytest.raises(ValueError):
            pdf_extract_text(p[:cut])
    # losing only the startxref/%%EOF tail still extracts — the parser
    # scans objects and finds the trailer dict itself, deliberate
    # leniency for tail-truncated crawl PDFs
    assert len(pdf_extract_text(p[: len(p) - 10])) == 2
    # corrupt the Flate stream
    bad = bytearray(p)
    i = bytes(bad).index(b"stream\n") + 7
    bad[i : i + 6] = b"\xff\xfe\xfd\xfc\xfb\xfa"
    with pytest.raises(ValueError):
        pdf_extract_text(bytes(bad))
    # seeded mutations: ValueError only
    import sys

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    rng = np.random.default_rng(424242)
    for mut in _mutations(p, rng, 250):
        try:
            pdf_extract_text(mut)
        except ValueError:
            pass
    # regression seeds from the round-7 extended fuzz pass: mutations
    # that once escaped as AttributeError ('tuple'.get on a stream
    # where a dict was expected) and TypeError ('in' on an int trailer)
    small = synth_pdf(1, 1)
    for seed in (10, 28, 49):
        rng = np.random.default_rng(seed * 7919 + 13)
        for mut in _mutations(small, rng, 25):
            for f in (pdf_extract_text, pdf_info):
                try:
                    f(mut)
                except ValueError:
                    pass


def test_spark_operator_and_probe(spark):
    good = synth_pdf(3, 2)
    rows = [
        ("ok", "doc", bytearray(good), {}),
        ("bad", "doc", bytearray(good[: len(good) // 3]), {}),
        ("null", "doc", None, {}),
    ]
    from vectra_py_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = extract_pdf_text_df(df, on_error="quarantine").collect()
    ok = sorted(
        [r for r in got if r.media_id == "ok"], key=lambda r: r.page
    )
    assert [r.page for r in ok] == [0, 1, 2]
    assert ok[1].text == "Page 1 line 0 lorem ipsum\nPage 1 line 1 lorem ipsum"
    errs = {r.media_id for r in got if r.error}
    assert errs == {"bad", "null"}
    with pytest.raises(Exception):
        extract_pdf_text_df(df, on_error="fail").collect()
    # probe triage knows PDFs
    assert probe_payload(good) == {"kind": "pdf", "n_frames": 3}


def test_warc_pdf_glue(spark):
    """application/pdf WARC records land as doc_type='pdf' documents;
    corrupt PDFs skip quietly (the glue is best-effort)."""
    from vectra_py_spark.sources.warc import (
        read_warc,
        synth_warc,
        warc_documents,
    )

    d = tempfile.mkdtemp()
    good = synth_pdf(2, 1)
    pages = [
        ("http://ex.org/paper.pdf", good, "application/pdf"),
        ("http://ex.org/broken.pdf", good[:50], "application/pdf"),
        ("http://ex.org/t.txt", b"plain", "text/plain"),
    ]
    with open(os.path.join(d, "s.warc"), "wb") as f:
        f.write(synth_warc(pages))
    docs = {r.uri: r for r in warc_documents(read_warc(spark, d)).collect()}
    assert set(docs) == {"http://ex.org/paper.pdf", "http://ex.org/t.txt"}
    assert docs["http://ex.org/paper.pdf"].doc_type == "pdf"
    assert "Page 0 line 0" in docs["http://ex.org/paper.pdf"].text
    assert "Page 1 line 0" in docs["http://ex.org/paper.pdf"].text
