"""Office/e-book extraction (DOCX/PPTX/ODT/EPUB): writer/reader round
trips incl. tab/break mapping and non-latin text, auto-detection, the
declared gates (OLE legacy binaries, DTD-carrying XML, ZIP bombs),
the ValueError-only malformed contract + fuzz, the Spark quarantine
operator and folder source, probe triage kinds, and the WARC
content-type routing glue."""

import io
import os
import tempfile
import zipfile

import numpy as np
import pytest

from vectra_py_spark.operators.office import (
    MEMBER_CEILING,
    docx_extract_text,
    encode_xlsx,
    xlsx_extract_text,
    encode_docx,
    encode_epub,
    encode_odt,
    encode_pptx,
    epub_extract_markdown,
    extract_office_text_df,
    odt_extract_text,
    office_extract_text,
    pptx_extract_text,
    read_office_documents,
)

_PARAS = ["Hello world", "tab\there and\nbreak", "unicode 日本語 ok", ""]


def test_docx_roundtrip():
    d = encode_docx(_PARAS)
    assert docx_extract_text(d) == "\n".join(_PARAS)
    assert office_extract_text(d) == ("docx", "\n".join(_PARAS))


def test_pptx_roundtrip_slide_order():
    # 11 slides: lexicographic member order (slide10 < slide2) must
    # NOT leak into deck order — numeric sort is load-bearing
    slides = [[f"slide {i} title", f"body {i}"] for i in range(11)]
    p = encode_pptx(slides)
    got = pptx_extract_text(p)
    assert got == [f"slide {i} title\nbody {i}" for i in range(11)]
    assert office_extract_text(p)[0] == "pptx"


def test_xlsx_roundtrip():
    """Sheets in numeric order, rows as tab-joined lines; shared
    strings (incl. the rich-run <r><t> shape the writer alternates),
    literal numerics, and a dangling sst reference degrading to
    empty — never a crash."""
    sheets = [
        [["Name", "Qty", "Note"],
         ["alpha", "3", "first row"],
         ["beta", "4.5", "日本語"]],
        [["second sheet cell"]],
    ]
    x = encode_xlsx(sheets)
    assert xlsx_extract_text(x) == [
        "Name\tQty\tNote\nalpha\t3\tfirst row\nbeta\t4.5\t日本語",
        "second sheet cell",
    ]
    assert office_extract_text(x)[0] == "xlsx"
    # dangling shared-string index → empty cell, not IndexError
    bad = x.replace(b't="s"><v>0<', b't="s"><v>9<', 1)
    flat = xlsx_extract_text(bad)[0]
    assert flat.startswith("\tQty") or "\t" in flat


def test_odt_roundtrip():
    o = encode_odt(_PARAS)
    assert odt_extract_text(o) == "\n".join(_PARAS)
    assert office_extract_text(o)[0] == "odt"


def test_epub_roundtrip_spine_order():
    chapters = [
        ("One", "<h1>Chapter One</h1><p>Body text.</p>"),
        ("Two", "<p>More 日本語.</p>"),
    ]
    e = encode_epub(chapters)
    ch = epub_extract_markdown(e)
    assert len(ch) == 2
    assert "# Chapter One" in ch[0] and "Body text." in ch[0]
    assert "More 日本語." in ch[1]
    assert office_extract_text(e)[0] == "epub"
    # OCF: mimetype member must be FIRST and STORED
    zf = zipfile.ZipFile(io.BytesIO(e))
    first = zf.infolist()[0]
    assert first.filename == "mimetype"
    assert first.compress_type == zipfile.ZIP_STORED


def test_gates_refuse_by_name():
    with pytest.raises(ValueError, match="OLE"):
        office_extract_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1rest")
    with pytest.raises(ValueError, match="not a ZIP"):
        office_extract_text(b"plain text, not a container")
    with pytest.raises(ValueError, match="corrupt ZIP|missing"):
        office_extract_text(encode_docx(["x"])[:40])
    # a ZIP that is none of the four formats
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "hello")
    with pytest.raises(ValueError, match="none of docx"):
        office_extract_text(buf.getvalue())


def test_dtd_refusal_and_bomb_cap():
    # document.xml carrying a DTD must refuse, not expand entities
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "word/document.xml",
            b'<?xml version="1.0"?><!DOCTYPE d [<!ENTITY a "b">]>'
            b"<d>&a;</d>",
        )
    with pytest.raises(ValueError, match="DTD"):
        docx_extract_text(buf.getvalue())
    # an over-ceiling member quarantines (ZIP bomb contract)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("word/document.xml", b"\x00" * (MEMBER_CEILING + 1))
    with pytest.raises(ValueError, match="bomb"):
        docx_extract_text(buf.getvalue())


def test_malformed_contract_fuzz():
    import sys

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    for base in (
        encode_docx(["fuzz seed"]),
        encode_pptx([["fuzz seed"]]),
        encode_xlsx([[["fuzz", "seed"], ["1", "2"]]]),
        encode_odt(["fuzz seed"]),
        encode_epub([("t", "<p>fuzz seed</p>")]),
    ):
        rng = np.random.default_rng(len(base))
        for mut in _mutations(base, rng, 80):
            try:
                office_extract_text(mut)
            except ValueError:
                pass
    # regression seeds from the round-8 fuzz campaign: mutations that
    # escaped as NotImplementedError out of the ZipFile CONSTRUCTOR
    # (mutated ZIP64 central directories, "zip file version N") before
    # _open_zip caught it
    import zlib

    from vectra_py_spark.operators.probe import probe_payload

    campaign = {
        "docx": encode_docx(["campaign line one", "two\tthree"]),
        "pptx": encode_pptx([["slide one"], ["slide two"]]),
        "odt": encode_odt(["campaign line one"]),
    }
    for target, base in campaign.items():
        rng = np.random.default_rng(
            zlib.crc32((target + "-campaign-r8").encode())
        )
        for mut in _mutations(base, rng, 300):
            for fn in (office_extract_text, probe_payload):
                try:
                    fn(mut)
                except ValueError:
                    pass


def test_probe_triage_kinds():
    from vectra_py_spark.operators.probe import probe_payload

    assert probe_payload(encode_docx(["x"]))["kind"] == "docx"
    p = probe_payload(encode_pptx([["a"], ["b"], ["c"]]))
    assert p["kind"] == "pptx" and p["n_frames"] == 3
    assert probe_payload(encode_odt(["x"]))["kind"] == "odt"
    px = probe_payload(encode_xlsx([[["a"]], [["b"]]]))
    assert px["kind"] == "xlsx" and px["n_frames"] == 2
    assert probe_payload(
        encode_epub([("t", "<p>x</p>")])
    )["kind"] == "epub"
    with pytest.raises(ValueError):
        probe_payload(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1rest")


def test_spark_quarantine_operator(spark):
    good = encode_docx(["alpha", "beta"])
    df = spark.createDataFrame(
        [("g", bytearray(good)), ("b", b"not a zip at all")],
        "media_id string, data binary",
    )
    rows = {
        r.media_id: r
        for r in extract_office_text_df(
            df, on_error="quarantine"
        ).collect()
    }
    assert rows["g"].doc_type == "docx"
    assert rows["g"].text == "alpha\nbeta" and rows["g"].error is None
    assert rows["b"].text is None and "not a ZIP" in rows["b"].error
    with pytest.raises(Exception):
        extract_office_text_df(df, on_error="fail").collect()


def test_read_office_documents_source(spark):
    d = tempfile.mkdtemp()
    fixtures = {
        "a.docx": encode_docx(["doc text body"]),
        "b.pptx": encode_pptx([["deck text"]]),
        "c.odt": encode_odt(["odt text body"]),
        "d.epub": encode_epub([("t", "<p>epub body</p>")]),
        "bad.docx": b"PK\x03\x04 truncated",
    }
    for name, data in fixtures.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(data)
    docs = {
        os.path.basename(r.uri): r
        for r in read_office_documents(spark, d).collect()
    }
    assert set(docs) == {"a.docx", "b.pptx", "c.odt", "d.epub"}
    assert docs["a.docx"].doc_type == "docx"
    assert docs["a.docx"].text == "doc text body"
    assert docs["b.pptx"].text == "deck text"
    assert "epub body" in docs["d.epub"].text


def test_warc_office_glue(spark):
    """DOCX/EPUB records in a crawl land as typed documents through
    warc_documents, alongside HTML/PDF."""
    from vectra_py_spark.sources.warc import (
        read_warc,
        synth_warc,
        warc_documents,
    )

    d = tempfile.mkdtemp()
    pages = [
        (
            "http://ex.org/report.docx",
            encode_docx(["quarterly report text"]),
            "application/vnd.openxmlformats-officedocument"
            ".wordprocessingml.document",
        ),
        (
            "http://ex.org/book.epub",
            encode_epub([("c1", "<p>book chapter text</p>")]),
            "application/epub+zip",
        ),
        ("http://ex.org/t.txt", b"plain", "text/plain"),
        (
            "http://ex.org/broken.docx",
            b"PK\x03\x04 nope",
            "application/vnd.openxmlformats-officedocument"
            ".wordprocessingml.document",
        ),
    ]
    with open(os.path.join(d, "s.warc"), "wb") as f:
        f.write(synth_warc(pages))
    docs = {r.uri: r for r in warc_documents(read_warc(spark, d)).collect()}
    assert set(docs) == {
        "http://ex.org/report.docx",
        "http://ex.org/book.epub",
        "http://ex.org/t.txt",
    }
    assert docs["http://ex.org/report.docx"].doc_type == "docx"
    assert docs["http://ex.org/report.docx"].text == (
        "quarterly report text"
    )
    assert docs["http://ex.org/book.epub"].doc_type == "epub"
    assert "book chapter text" in docs["http://ex.org/book.epub"].text


def test_review_gates_odt_depth_and_padded_dtd():
    """Review findings: deep ODT nesting must quarantine as
    ValueError (not RecursionError, which would fail the stage), and
    a DOCTYPE pushed past any prefix window by comment padding must
    still refuse."""
    buf = io.BytesIO()
    deep = (
        b'<?xml version="1.0"?>'
        b'<office:document-content xmlns:office="urn:oasis:names:tc:'
        b'opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:'
        b'tc:opendocument:xmlns:text:1.0"><office:body><office:text>'
        b"<text:p>" + b"<text:span>" * 5000 + b"x"
        + b"</text:span>" * 5000 + b"</text:p>"
        b"</office:text></office:body></office:document-content>"
    )
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("content.xml", deep)
    with pytest.raises(ValueError, match="nesting too deep"):
        odt_extract_text(buf.getvalue())
    buf = io.BytesIO()
    padded = (
        b"<!--" + b"x" * 5000 + b"-->"
        b'<!DOCTYPE d [<!ENTITY a "b">]><d>&a;</d>'
    )
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", padded)
    with pytest.raises(ValueError, match="DTD"):
        docx_extract_text(buf.getvalue())


def test_encrypted_odt_and_drm_epub_refuse_by_name():
    """ODF manifests declaring encryption-data and EPUB DRM
    (encryption.xml) refuse with named errors, not confusing XML
    parse failures on ciphertext."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr(
            "META-INF/manifest.xml",
            '<manifest:manifest xmlns:manifest="urn:x"><manifest:file-'
            'entry manifest:full-path="content.xml"><manifest:'
            "encryption-data/></manifest:file-entry></manifest:manifest>",
        )
        zf.writestr("content.xml", b"\x8b\x1f\x00 ciphertext blob")
    with pytest.raises(ValueError, match="encrypted ODT"):
        odt_extract_text(buf.getvalue())
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml", "<container/>")
        zf.writestr("META-INF/encryption.xml", "<encryption/>")
    with pytest.raises(ValueError, match="DRM/encrypted EPUB"):
        epub_extract_markdown(buf.getvalue())
