"""Folder-of-anything ingestion (`sources/documents.py`): magic-byte
dispatch across every supported format in one directory, HTML vs
plain-text sniffing, binary-garbage skipping, end-to-end into a
document index."""

import os
import tempfile

import pytest

from vectra_py_spark.sources.documents import (
    extract_any_document,
    read_documents,
)


def test_extract_any_document_dispatch():
    from vectra_py_spark.operators.office import encode_docx
    from vectra_py_spark.operators.pdf import encode_pdf
    from vectra_py_spark.operators.rtf import encode_rtf

    assert extract_any_document(encode_pdf([["pdf body"]])) == (
        "pdf", "pdf body"
    )
    assert extract_any_document(encode_docx(["docx body"])) == (
        "docx", "docx body"
    )
    assert extract_any_document(encode_rtf(["rtf body"])) == (
        "rtf", "rtf body"
    )
    kind, text = extract_any_document(
        b"<!DOCTYPE html><html><body><h1>Title</h1><p>para</p></body>"
        b"</html>"
    )
    assert kind == "md" and "# Title" in text and "para" in text
    assert extract_any_document(b"just plain notes\n") == (
        "txt", "just plain notes\n"
    )
    # OLE routes to the office gate (named refusal), binary garbage to
    # the magic gate — both ValueError
    with pytest.raises(ValueError, match="OLE"):
        extract_any_document(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1rest")
    with pytest.raises(ValueError, match="binary payload"):
        extract_any_document(bytes(range(256)) * 16)


def test_read_documents_mixed_folder(spark):
    from vectra_py_spark.operators.office import encode_epub, encode_xlsx
    from vectra_py_spark.operators.pdf import encode_pdf
    from vectra_py_spark.operators.rtf import encode_rtf

    d = tempfile.mkdtemp()
    fixtures = {
        "a.pdf": encode_pdf([["pdf page text"]]),
        # encrypted PDFs open transparently (owner-password-only)
        "enc.pdf": encode_pdf(
            [["secret pdf text"]], encrypt="o", encrypt_mode="aesv2"
        ),
        "b.epub": encode_epub([("c", "<p>epub chapter</p>")]),
        "c.rtf": encode_rtf(["rtf memo"]),
        "d.xlsx": encode_xlsx([[["sheet", "cells"]]]),
        "e.html": b"<html><body><p>web page para</p></body></html>",
        "f.txt": b"plain text file",
        "junk.bin": bytes(range(256)) * 8,
    }
    for name, data in fixtures.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(data)
    docs = {
        os.path.basename(r.uri): r
        for r in read_documents(spark, d).collect()
    }
    assert set(docs) == {
        "a.pdf", "enc.pdf", "b.epub", "c.rtf", "d.xlsx", "e.html",
        "f.txt",
    }
    assert docs["a.pdf"].doc_type == "pdf"
    assert docs["enc.pdf"].text == "secret pdf text"
    assert docs["b.epub"].doc_type == "epub"
    assert docs["c.rtf"].text == "rtf memo"
    assert docs["d.xlsx"].text == "sheet\tcells"
    assert docs["e.html"].doc_type == "md"
    assert "web page para" in docs["e.html"].text
    assert docs["f.txt"].doc_type == "txt"


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_folder_to_index_e2e(spark):
    """The one-call path a user actually runs: folder → read_documents
    → upsert_documents_df → retrieval sees the content."""
    from vectra_py_spark.document_index import SparkDocumentIndex
    from vectra_py_spark.operators.rtf import encode_rtf

    d = tempfile.mkdtemp()
    with open(os.path.join(d, "memo.rtf"), "wb") as f:
        f.write(encode_rtf(["the quarterly revenue memo discusses targets"]))
    with open(os.path.join(d, "note.txt"), "wb") as f:
        f.write(b"an unrelated note about gardening and tomato plants")
    ix_path = os.path.join(tempfile.mkdtemp(), "ix")
    ix = SparkDocumentIndex(spark, ix_path, vector_dim=32)
    ix.create()
    ix.upsert_documents_df(read_documents(spark, d))
    got = ix.query_documents(
        "quarterly revenue targets", max_documents=1
    ).collect()
    assert len(got) == 1
    assert got[0]["uri"].endswith("memo.rtf")


def test_read_archive_documents(spark):
    """TAR/ZIP bundles of mixed documents → extracted rows: the
    packed-small-files ingest path. Covers .tar.gz autodetect, ZIP,
    bang-convention URIs, junk-member skip and corrupt-archive
    quarantine (archive dropped, others unaffected)."""
    import io
    import tarfile
    import zipfile

    from vectra_py_spark.operators.office import encode_docx
    from vectra_py_spark.operators.pdf import encode_pdf
    from vectra_py_spark.operators.rtf import encode_rtf
    from vectra_py_spark.sources.documents import read_archive_documents

    d = tempfile.mkdtemp()
    members = {
        "inner/a.pdf": encode_pdf([["packed pdf text"]]),
        "b.rtf": encode_rtf(["packed rtf memo"]),
        "c.docx": encode_docx(["packed docx para"]),
        "notes.txt": b"packed plain notes",
        "junk.bin": bytes(range(256)) * 8,
    }
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as t:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    with open(os.path.join(d, "bundle.tar.gz"), "wb") as f:
        f.write(tbuf.getvalue())
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        z.writestr("z.txt", b"zipped text file")
    with open(os.path.join(d, "bundle.zip"), "wb") as f:
        f.write(zbuf.getvalue())
    with open(os.path.join(d, "broken.tar"), "wb") as f:
        f.write(b"\x00not a tar at all" * 40)

    rows = {
        r.uri.split("!", 1)[1]: r
        for r in read_archive_documents(spark, d).collect()
    }
    assert set(rows) == {
        "inner/a.pdf", "b.rtf", "c.docx", "notes.txt", "z.txt",
    }
    assert rows["inner/a.pdf"].text == "packed pdf text"
    assert rows["inner/a.pdf"].doc_type == "pdf"
    assert rows["b.rtf"].text == "packed rtf memo"
    assert rows["c.docx"].doc_type == "docx"
    assert rows["z.txt"].text == "zipped text file"
    assert all("!" in r.uri for r in rows.values())


@pytest.mark.slow
def test_streaming_archive_documents_twin(spark):
    """Continuous packed-corpus drops: availableNow drain over an
    archive drop folder must produce EXACTLY the batch
    read_archive_documents rows, and a second drain after a new
    bundle arrives must walk only the new archive (exactly-once per
    batch id)."""
    import io
    import tarfile
    import zipfile

    from vectra_py_spark.operators.rtf import encode_rtf
    from vectra_py_spark.sources.documents import read_archive_documents
    from vectra_py_spark.streaming.archives import (
        archive_file_stream,
        stream_archive_documents,
    )

    drop = tempfile.mkdtemp()
    sink = os.path.join(tempfile.mkdtemp(), "sink")
    ckpt = os.path.join(tempfile.mkdtemp(), "ckpt")
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as t:
        data = encode_rtf(["streamed archive rtf"])
        info = tarfile.TarInfo("m.rtf")
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
        info = tarfile.TarInfo("n.txt")
        info.size = 13
        t.addfile(info, io.BytesIO(b"streamed text"))
    with open(os.path.join(drop, "b1.tar.gz"), "wb") as f:
        f.write(tbuf.getvalue())
    with open(os.path.join(drop, "broken.tar"), "wb") as f:
        f.write(b"\x00garbage" * 50)  # quarantines in-stream

    q = stream_archive_documents(
        archive_file_stream(spark, drop), sink, ckpt
    )
    q.awaitTermination(120)
    got = {r.uri.split("!", 1)[1]: r for r in spark.read.parquet(sink).collect()}
    want = {
        r.uri.split("!", 1)[1]: r
        for r in read_archive_documents(spark, drop).collect()
    }
    assert set(got) == set(want) == {"m.rtf", "n.txt"}
    for k in got:
        assert got[k].text == want[k].text
        assert got[k].doc_type == want[k].doc_type

    # second drop: only the new bundle is walked
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        z.writestr("late.txt", b"late zip member")
    with open(os.path.join(drop, "b2.zip"), "wb") as f:
        f.write(zbuf.getvalue())
    q2 = stream_archive_documents(
        archive_file_stream(spark, drop), sink, ckpt
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert sorted(r.uri.split("!", 1)[1] for r in rows) == [
        "late.txt", "m.rtf", "n.txt",
    ]


def test_streaming_documents_twin(spark):
    """The continuous-ingest twin: availableNow drain over a drop
    folder must produce EXACTLY the batch read_documents rows
    (same extractor), and a second drain after new files arrive must
    process only the new ones (exactly-once per batch id)."""
    from vectra_py_spark.sources.documents import read_documents
    from vectra_py_spark.streaming.documents import (
        document_file_stream,
        stream_documents,
    )

    from vectra_py_spark.operators.doc import encode_doc
    from vectra_py_spark.operators.office import encode_docx
    from vectra_py_spark.operators.pdf import encode_pdf
    from vectra_py_spark.operators.rtf import encode_rtf
    from vectra_py_spark.operators.xls import encode_xls

    drop = tempfile.mkdtemp()
    sink = os.path.join(tempfile.mkdtemp(), "sink")
    ckpt = os.path.join(tempfile.mkdtemp(), "ckpt")
    # mixed drop incl. office/legacy payloads — continuous drops of
    # mixed documents get the same guarantee as WARC (VERDICT r8
    # item 6); extensions deliberately lie (magic-byte dispatch)
    first_drop = {
        "a.pdf": encode_pdf([["streamed pdf text"]]),
        "b.rtf": encode_rtf(["streamed rtf text"]),
        "report.dat": encode_docx(["streamed docx para"]),
        "legacy.bin": encode_doc(["streamed legacy doc text"]),
        "grid.blob": encode_xls([[["streamed", "xls cells"]]]),
        "junk.bin": bytes(range(256)) * 8,
    }
    for name, data in first_drop.items():
        with open(os.path.join(drop, name), "wb") as f:
            f.write(data)

    q = stream_documents(
        document_file_stream(spark, drop), sink, ckpt
    )
    q.awaitTermination(120)
    got = {
        os.path.basename(r.uri): r for r in spark.read.parquet(sink).collect()
    }
    want = {
        os.path.basename(r.uri): r
        for r in read_documents(spark, drop).collect()
    }
    assert set(got) == set(want) == {
        "a.pdf", "b.rtf", "report.dat", "legacy.bin", "grid.blob",
    }
    for k in got:
        assert got[k].text == want[k].text
        assert got[k].doc_type == want[k].doc_type
    assert got["report.dat"].doc_type == "docx"
    assert got["legacy.bin"].doc_type == "doc"
    assert got["grid.blob"].text == "streamed\txls cells"

    # second drop: only the new file lands (no re-extraction)
    with open(os.path.join(drop, "c.txt"), "wb") as f:
        f.write(b"late arrival text")
    q2 = stream_documents(
        document_file_stream(spark, drop), sink, ckpt
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 6
    assert sorted(os.path.basename(r.uri) for r in rows) == [
        "a.pdf", "b.rtf", "c.txt", "grid.blob", "legacy.bin",
        "report.dat",
    ]
