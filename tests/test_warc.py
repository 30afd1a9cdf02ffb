"""WARC web-archive source: record parse (plain + per-record gzip
members), HTTP layer peel, the Spark explode with per-file quarantine,
ZIP/TAR media bundles, and end-to-end composition into the existing
media (probe/features) and document (html→markdown) pipelines —
Common Crawl-shaped ingestion."""

import gzip
import os
import tarfile
import tempfile
import zipfile

import pytest

from vectra_py_spark.operators import multimodal as mm
from vectra_py_spark.operators.probe import probe_payload
from vectra_py_spark.sources.warc import (
    parse_warc,
    read_media_archive,
    read_warc,
    synth_warc,
)


def _pages():
    img = mm.decode_ppm(mm.synth_ppm(16, 8))
    return [
        ("http://ex.org/a.html",
         b"<html><body><h1>Title</h1><p>Body text</p></body></html>",
         "text/html"),
        ("http://ex.org/pic.jpg", mm.encode_jpeg(img), "image/jpeg"),
        ("http://ex.org/clip.flac",
         __import__(
             "vectra_py_spark.operators.flac", fromlist=["synth_flac"]
         ).synth_flac(),
         "audio/flac"),
    ]


def test_parse_plain_and_gzip_round_trip():
    pages = _pages()
    for compress in (False, True):
        recs = parse_warc(synth_warc(pages, compress=compress))
        assert [r["warc_type"] for r in recs] == ["warcinfo"] + ["response"] * 3
        for (url, body, ctype), rec in zip(pages, recs[1:]):
            assert rec["url"] == url
            assert rec["http_status"] == 200
            assert rec["content_type"] == ctype
            assert rec["payload"] == body  # HTTP layer peeled, byte-exact


def test_parse_malformed_contract():
    good = synth_warc(_pages())
    with pytest.raises(ValueError, match="not a WARC"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\nbody\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc(good[: len(good) // 2])
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(b"\x1f\x8b\x08" + b"\x00" * 10)
    # payload fuzz: mutations never escape ValueError
    import numpy as np
    import sys

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    rng = np.random.default_rng(12021)
    for mut in _mutations(good, rng, 200):
        try:
            parse_warc(mut)
        except ValueError:
            pass
    # regression: gzip members whose deflate data is corrupt raise
    # zlib.error inside gzip — must surface as ValueError (round-7
    # extended fuzz finding)
    gz = synth_warc(_pages()[:1], compress=True)
    rng = np.random.default_rng(13)
    for mut in _mutations(gz, rng, 60):
        try:
            parse_warc(mut)
        except ValueError:
            pass


def test_read_warc_spark_and_pipeline_composition(spark):
    d = tempfile.mkdtemp()
    pages = _pages()
    with open(os.path.join(d, "seg0.warc"), "wb") as f:
        f.write(synth_warc(pages))
    with open(os.path.join(d, "seg1.warc.gz"), "wb") as f:
        f.write(synth_warc(pages, compress=True))
    with open(os.path.join(d, "broken.warc"), "wb") as f:
        f.write(b"WARC/1.0\r\nBad\r\n\r\n")

    df = read_warc(spark, d)
    rows = df.collect()
    by_archive = {}
    for r in rows:
        by_archive.setdefault(os.path.basename(r.archive.replace("file:", "")), []).append(r)
    assert set(by_archive) == {"seg0.warc", "seg1.warc.gz", "broken.warc"}
    # quarantined file: one error row
    bad = by_archive["broken.warc"]
    assert len(bad) == 1 and bad[0].error and bad[0].payload is None
    # both good archives yield 4 records each with intact payloads
    for name in ("seg0.warc", "seg1.warc.gz"):
        recs = sorted(by_archive[name], key=lambda r: r.record_idx)
        assert [r.warc_type for r in recs] == ["warcinfo"] + ["response"] * 3
        assert bytes(recs[2].payload) == pages[1][1]

    # composition: media records → probe + features; html → markdown docs
    media = (
        df.filter("content_type LIKE 'image/%' OR content_type LIKE 'audio/%'")
        .selectExpr("url AS media_id", "'media' AS modality",
                    "payload AS data", "map() AS meta")
    )
    from vectra_py_spark.operators.probe import probe_media

    probed = {r.media_id: r for r in probe_media(media).collect()}
    assert all(r.error is None for r in probed.values())
    kinds = {r.kind for r in probed.values()}
    assert kinds == {"jpeg", "flac"}
    feats = mm.extract_features(media, decoder="auto", on_error="quarantine")
    assert all(r.decode_error is None for r in feats.collect())

    from vectra_py_spark.sources.fetchers import html_to_markdown

    html_rows = df.filter("content_type = 'text/html'").collect()
    md = html_to_markdown(bytes(html_rows[0].payload).decode())
    assert "# Title" in md and "Body text" in md


def test_decompression_bomb_quarantines_not_oom():
    """A gzip bomb must raise ValueError at the output ceiling
    (→ quarantine row), never allocate the full expansion (ADVICE r7:
    the old whole-archive gunzip contradicted the per-file quarantine
    contract)."""
    # ~64 MiB of zeros → a few-KiB gzip "archive"
    bomb_gz = gzip.compress(b"WARC/1.0\r\n" + b"\x00" * (64 << 20))
    with pytest.raises(ValueError, match="bomb"):
        parse_warc(bomb_gz, max_bytes=1 << 20)
    # the per-call cap overrides the module ceiling both ways
    small = synth_warc(_pages(), compress=True)
    with pytest.raises(ValueError, match="bomb"):
        parse_warc(small, max_bytes=8)
    assert parse_warc(small)  # the default still parses real archives
    # module-wide ceiling is honored too
    import vectra_py_spark.sources.warc as W

    old = W.DECOMPRESS_CEILING
    W.DECOMPRESS_CEILING = 1 << 20
    try:
        with pytest.raises(ValueError, match="bomb"):
            parse_warc(bomb_gz)
    finally:
        W.DECOMPRESS_CEILING = old


def test_read_media_archive_bomb_quarantines(spark):
    import vectra_py_spark.sources.warc as W

    d = tempfile.mkdtemp()
    with zipfile.ZipFile(
        os.path.join(d, "bomb.zip"), "w", zipfile.ZIP_DEFLATED
    ) as z:
        z.writestr("big.bin", b"\x00" * (64 << 20))
    old = W.DECOMPRESS_CEILING
    W.DECOMPRESS_CEILING = 1 << 20
    try:
        rows = read_media_archive(
            spark.newSession(), d
        ).collect()
    finally:
        W.DECOMPRESS_CEILING = old
    assert len(rows) == 1
    assert rows[0].error and "bomb" in rows[0].error


def test_read_media_archive_zip_and_tar(spark):
    d = tempfile.mkdtemp()
    img = mm.encode_png(mm.decode_ppm(mm.synth_ppm(8, 8)))
    wav = mm.synth_wav(seconds=0.05)
    zp = os.path.join(d, "bundle.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("imgs/a.png", img)
        z.writestr("audio/b.wav", wav)
        z.writestr("empty_dir/", b"")
    tp = os.path.join(d, "bundle.tar.gz")
    with tarfile.open(tp, "w:gz") as t:
        import io as _io

        info = tarfile.TarInfo("c.png")
        info.size = len(img)
        t.addfile(info, _io.BytesIO(img))
    with open(os.path.join(d, "junk.zip"), "wb") as f:
        f.write(b"PK\x03\x04 nope")

    rows = read_media_archive(spark, d).collect()
    by_member = {r.member: r for r in rows if r.member}
    assert set(by_member) == {"imgs/a.png", "audio/b.wav", "c.png"}
    assert bytes(by_member["imgs/a.png"].payload) == img
    assert probe_payload(bytes(by_member["c.png"].payload))["kind"] == "png"
    errs = [r for r in rows if r.error]
    assert len(errs) == 1 and "junk.zip" in errs[0].archive


def test_warc_documents_honors_declared_charset(spark):
    """A Content-Type charset= parameter drives the text decode:
    iso-8859-1 bytes stop mojibaking, utf-16 decodes, a bogus charset
    falls back to UTF-8-replace (headers lie; stages survive)."""
    import os as _os
    import tempfile as _tf

    from vectra_py_spark.sources.warc import warc_documents

    latin = "café ñandú"
    pages = [
        ("http://ex.org/l1", latin.encode("iso-8859-1"),
         "text/plain; charset=ISO-8859-1"),
        ("http://ex.org/u16", latin.encode("utf-16"),
         'text/plain; charset="utf-16"'),
        ("http://ex.org/bogus", latin.encode("iso-8859-1"),
         "text/plain; charset=not-a-codec"),
        ("http://ex.org/plain", latin.encode("utf-8"), "text/plain"),
    ]
    d = _tf.mkdtemp()
    with open(_os.path.join(d, "cs.warc"), "wb") as f:
        f.write(synth_warc(pages))
    got = {r.uri: r.text for r in
           warc_documents(read_warc(spark, d)).collect()}
    assert got["http://ex.org/l1"] == latin
    assert got["http://ex.org/u16"] == latin
    assert got["http://ex.org/plain"] == latin
    assert "�" in got["http://ex.org/bogus"]  # utf-8 fallback, visible


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_warc_documents_glue_and_index_ingest(spark):
    """The crawl→corpus glue: response records become (uri, text,
    doc_type) rows and flow into SparkDocumentIndex.upsert_documents_df
    — WARC to queryable index end-to-end."""
    import tempfile as tf

    d = tf.mkdtemp()
    pages = _pages() + [
        ("http://ex.org/notes.txt", b"plain text notes body", "text/plain"),
    ]
    with open(os.path.join(d, "seg.warc"), "wb") as f:
        f.write(synth_warc(pages))
    records = read_warc(spark, d)
    from vectra_py_spark.sources.warc import warc_documents

    docs = warc_documents(records)
    got = {r.uri: r for r in docs.collect()}
    # only the text-like records survive (image/audio filtered out)
    assert set(got) == {"http://ex.org/a.html", "http://ex.org/notes.txt"}
    assert got["http://ex.org/a.html"].doc_type == "md"
    assert "# Title" in got["http://ex.org/a.html"].text
    assert got["http://ex.org/notes.txt"].doc_type == "txt"
    assert got["http://ex.org/notes.txt"].text == "plain text notes body"

    from vectra_py_spark.document_index import SparkDocumentIndex

    ix = SparkDocumentIndex(spark, tf.mkdtemp() + "/ix", vector_dim=16)
    ix.create()
    ix.upsert_documents_df(docs, doc_type_col="doc_type")
    res = ix.query_documents("plain text notes", max_documents=2)
    assert res.count() >= 1


def test_streaming_warc_matches_batch(spark):
    """Streaming-twin discipline: the record stream over a drop dir
    produces exactly the batch reader's rows, exactly-once, with a
    corrupt archive quarantined in-stream; a later drop only appends."""
    import tempfile as tf

    from vectra_py_spark.streaming.warc import (
        stream_warc_records,
        warc_file_stream,
    )

    drop = tf.mkdtemp()
    sink = tf.mkdtemp() + "/records"
    ckpt = tf.mkdtemp() + "/ckpt"
    with open(os.path.join(drop, "a.warc"), "wb") as f:
        f.write(synth_warc(_pages()))
    with open(os.path.join(drop, "bad.warc"), "wb") as f:
        f.write(b"WARC/1.0\r\nbroken\r\n\r\n")

    q = stream_warc_records(warc_file_stream(spark, drop), sink, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(sink).collect()
    batch = read_warc(spark, drop).collect()

    def key(r):
        return (os.path.basename(r.archive.replace("file:", "")),
                r.record_idx, r.warc_type, r.url,
                bytes(r.payload) if r.payload is not None else None,
                r.error is None)

    assert sorted(map(key, got)) == sorted(map(key, batch))
    assert any(r.error for r in got)  # quarantine row present in-stream

    # incremental drain: a new archive appends its records only
    with open(os.path.join(drop, "b.warc.gz"), "wb") as f:
        f.write(synth_warc(_pages()[:1], compress=True))
    q2 = stream_warc_records(warc_file_stream(spark, drop), sink, ckpt)
    q2.awaitTermination(120)
    after = spark.read.parquet(sink)
    assert after.count() == len(got) + 2  # warcinfo + 1 response


def test_wet_roundtrip_pure():
    """synth_wet → parse_warc: conversion records carry the text
    verbatim; the CDX indexer covers them too (WET archives are
    indexable)."""
    from vectra_py_spark.sources.cdx import index_warc, parse_cdxj_line
    from vectra_py_spark.sources.warc import parse_warc, synth_wet

    docs = [("https://a.example/x", "extracted text one"),
            ("https://b.example/y", "zweite Seite: café")]
    for compress in (False, True):
        payload = synth_wet(docs, compress=compress)
        recs = [r for r in parse_warc(payload)
                if r["warc_type"] == "conversion"]
        assert [(r["url"], r["payload"].decode()) for r in recs] == docs
        entries = [parse_cdxj_line(ln)
                   for ln in index_warc(payload, "f.wet.gz")]
        assert {e["url"] for e in entries} == {u for u, _ in docs}
        assert all(e["status"] is None for e in entries)
        assert all(e["mime"] == "text/plain" for e in entries)


def test_wet_spark_export_import_roundtrip(spark):
    """to_wet_shards → files on disk → read_warc → wet_documents
    reproduces the corpus exactly; shard membership and payload bytes
    are deterministic across runs."""
    import os
    import tempfile

    from vectra_py_spark.sources.warc import (
        read_warc, to_wet_shards, wet_documents,
    )

    docs = [(f"https://h{i % 5}.example/d{i}", f"doc body {i} café")
            for i in range(37)]
    df = spark.createDataFrame(docs, ["uri", "text"])
    shards1 = {r.shard: bytes(r.payload)
               for r in to_wet_shards(df, n_shards=4).collect()}
    shards2 = {r.shard: bytes(r.payload)
               for r in to_wet_shards(df, n_shards=4).collect()}
    assert shards1 == shards2  # deterministic bytes

    d = tempfile.mkdtemp()
    for sh, payload in shards1.items():
        with open(os.path.join(d, f"part-{sh}.warc.wet.gz"), "wb") as f:
            f.write(payload)
    got = {
        r.uri: r.text
        for r in wet_documents(read_warc(spark, d)).collect()
    }
    assert got == dict(docs)


def test_wet_documents_invalid_utf8_replaced(spark):
    """ADVICE r9 (high): one non-UTF-8 conversion record must yield
    U+FFFD replacement chars, not fail the job (plain Catalyst decode
    raises MALFORMED_CHARACTER_CODING on Spark 4)."""
    import os
    import tempfile

    from vectra_py_spark.sources.warc import (
        read_warc, synth_wet, wet_documents,
    )

    good = synth_wet([("https://ok.example/a", "fine text")])
    # hand-build a conversion record whose payload is NOT valid UTF-8
    bad_body = b"latin1 caf\xe9 and junk \xff\xfe end"
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Record-ID: <urn:uuid:bad>\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"WARC-Target-URI: https://bad.example/b\r\n"
        b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(bad_body)}\r\n\r\n".encode()
        + bad_body + b"\r\n\r\n"
    )
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "mix.warc"), "wb") as f:
        f.write(good + bad)
    got = {r.uri: r.text
           for r in wet_documents(read_warc(spark, d)).collect()}
    assert got["https://ok.example/a"] == "fine text"
    assert got["https://bad.example/b"] == bad_body.decode(
        "utf-8", "replace"
    )


def test_to_wet_shards_whole_shard_per_call(spark):
    """ADVICE r9 (medium): shard payloads must not depend on Arrow
    batch boundaries — with maxRecordsPerBatch far below the shard
    size, each shard still emits exactly ONE row whose payload equals
    the full-shard encoding."""
    from vectra_py_spark.sources.warc import synth_wet, to_wet_shards

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "7")
    try:
        docs = [(f"https://h{i % 3}.example/d{i}", f"body {i}")
                for i in range(100)]
        df = spark.createDataFrame(docs, ["uri", "text"])
        rows = to_wet_shards(df, n_shards=2, compress=False).collect()
        assert sorted(r.shard for r in rows) == [0, 1]  # one row/shard
        assert sum(r.n_docs for r in rows) == 100
        # payload bytes = synth_wet over the whole shard, URI-sorted
        import pandas as pd

        from pyspark.sql import functions as F
        want = {}
        assign = df.select(
            "uri", "text",
            F.pmod(F.xxhash64("uri"), F.lit(2)).cast("int").alias("s"),
        ).collect()
        by_shard = {}
        for r in assign:
            by_shard.setdefault(r.s, []).append((r.uri, r.text))
        for s, members in by_shard.items():
            want[s] = synth_wet(sorted(members), compress=False)
        assert {r.shard: bytes(r.payload) for r in rows} == want
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
