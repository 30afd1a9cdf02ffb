"""Crawl-to-corpus end-to-end: one WARC drop containing HTML pages,
PDFs, images, audio, video, and junk flows through the full pipeline —
record explode → triage → media features → document extraction →
dedup → quality → index ingest → retrieval — with every quarantine
layer exercised. The integration story the individual operator tests
compose into."""

import os
import tempfile

import numpy as np
import pytest

from vectra_py_spark.operators import multimodal as mm
from vectra_py_spark.operators.avi import synth_avi
from vectra_py_spark.operators.flac import synth_flac
from vectra_py_spark.operators.mp4 import synth_mp4
from vectra_py_spark.operators.pdf import synth_pdf
from vectra_py_spark.operators.probe import probe_media
from vectra_py_spark.sources.warc import (
    read_warc,
    synth_warc,
    warc_documents,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier


def _crawl(seed: int):
    """A small synthetic crawl: text pages (with one exact duplicate),
    a PDF, mixed media, and one corrupt payload."""
    img = mm.decode_ppm(mm.synth_ppm(24, 16))
    html = (
        f"<html><body><h1>Spark engines {seed}</h1>"
        + "".join(f"<p>site {seed} paragraph {i} about distributed joins</p>"
                  for i in range(6))
        + "</body></html>"
    ).encode()
    return [
        (f"http://site{seed}.org/a.html", html, "text/html"),
        (f"http://site{seed}.org/dup.html", html, "text/html"),  # exact dup
        (f"http://site{seed}.org/paper.pdf",
         __import__(
             "vectra_py_spark.operators.pdf", fromlist=["encode_pdf"]
         ).encode_pdf(
             [[f"site {seed} page {p} line {i}" for i in range(3)]
              for p in range(2)]
         ),
         "application/pdf"),
        (f"http://site{seed}.org/brief.pdf",
         __import__(
             "vectra_py_spark.operators.pdf", fromlist=["encode_pdf"]
         ).encode_pdf(
             [[f"aes128 brief {seed}"]],
             encrypt="owner-secret", encrypt_mode="aesv2",
         ),
         "application/pdf"),
        (f"http://site{seed}.org/locked.pdf",
         __import__(
             "vectra_py_spark.operators.pdf", fromlist=["encode_pdf"]
         ).encode_pdf(
             [[f"aes256 locked {seed}"]],
             encrypt="owner-secret", encrypt_mode="aesv3",
         ),
         "application/pdf"),
        (f"http://site{seed}.org/logo.jpg", mm.encode_jpeg(img),
         "image/jpeg"),
        (f"http://site{seed}.org/icon.png", mm.encode_png(img), "image/png"),
        (f"http://site{seed}.org/anim.gif", mm.synth_gif(3, 24, 16),
         "image/gif"),
        (f"http://site{seed}.org/clip.flac", synth_flac(), "audio/flac"),
        (f"http://site{seed}.org/promo.avi", synth_avi(3, 24, 16),
         "video/avi"),
        (f"http://site{seed}.org/promo.mp4", synth_mp4(3, 24, 16),
         "video/mp4"),
        (f"http://site{seed}.org/corrupt.jpg", b"\xff\xd8truncated",
         "image/jpeg"),
    ]


def test_crawl_to_corpus_pipeline(spark):
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "seg0.warc"), "wb") as f:
        f.write(synth_warc(_crawl(0)))
    with open(os.path.join(d, "seg1.warc.gz"), "wb") as f:
        f.write(synth_warc(_crawl(1), compress=True))

    records = read_warc(spark, d)
    responses = records.filter("warc_type = 'response'")
    assert responses.count() == 24

    # 1) TRIAGE: header-only probe over every payload; the corrupt
    #    JPEGs quarantine, everything else types correctly
    media_shaped = responses.selectExpr(
        "url AS media_id", "'media' AS modality", "payload AS data",
        "CAST(map() AS MAP<STRING,STRING>) AS meta",
    )
    probed = probe_media(media_shaped)
    kinds = {
        r.media_id: r.kind for r in probed.collect() if r.error is None
    }
    assert sorted(set(kinds.values())) == [
        "avi", "flac", "gif", "jpeg", "mp4", "pdf", "png",
    ]
    bad = [r for r in probed.collect() if r.error is not None]
    # corrupt jpgs + the html/txt payloads (not media) fail triage
    assert {os.path.basename(r.media_id) for r in bad} >= {
        "corrupt.jpg", "a.html", "dup.html",
    }

    # 2) MEDIA: probe-before-decode FUSED — triage_media routes only
    #    the decodable media kinds into the decoder, in one narrow
    #    pass: no driver round-trip, no join, payloads never shuffle,
    #    and the corrupt/html/pdf rows never reach a pixel decoder
    #    (bytes-decoded saving quantified in BENCH.md)
    from vectra_py_spark.operators.probe import triage_media

    media_rows = triage_media(
        media_shaped,
        kinds={"jpeg", "png", "gif", "bmp", "ppm", "wav", "flac",
               "avi", "mp4"},
    ).drop("kind", "n_bytes")
    feats = mm.extract_features(
        media_rows, decoder="auto", on_error="quarantine"
    ).collect()
    assert len(feats) == 12  # 6 media files × 2 sites
    assert all(r.decode_error is None for r in feats)

    # 2.5) ENCRYPTION POLICY: probe-before-decrypt lane split. The
    #    AES-256 R6 key stretch is ~418 ms/doc BY SPEC DESIGN; at
    #    crawl scale those documents must be routed to a budgeted
    #    lane (or skipped) BEFORE any key derivation runs. pdf_probe
    #    reports the flavor at ~0.2 ms without deriving a key, so the
    #    policy stage is ~2000× cheaper than one blind R6 decrypt
    #    (decrypt-ms saved quantified in BENCH.md).
    from pyspark.sql import functions as F

    from vectra_py_spark.operators.pdf import (
        extract_pdf_text_df,
        pdf_triage_lanes,
    )

    pdf_rows = responses.filter("url LIKE '%.pdf'").selectExpr(
        "url AS media_id", "payload AS data"
    )
    lanes = pdf_triage_lanes(pdf_rows)
    by_lane = {
        r.media_id: (r.lane, r.encryption) for r in lanes.collect()
    }
    for seed in (0, 1):
        assert by_lane[f"http://site{seed}.org/paper.pdf"] == (
            "fast", None)
        assert by_lane[f"http://site{seed}.org/brief.pdf"] == (
            "fast", "aesv2")
        assert by_lane[f"http://site{seed}.org/locked.pdf"] == (
            "budgeted", "aesv3")
    # the budgeted lane still decodes when the budget allows — the
    # policy defers cost, it does not lose documents
    budgeted_payloads = pdf_rows.join(
        lanes.filter("lane = 'budgeted'").select("media_id"), "media_id"
    )
    budgeted_text = extract_pdf_text_df(budgeted_payloads).collect()
    assert sorted(r.text for r in budgeted_text) == [
        "aes256 locked 0", "aes256 locked 1",
    ]

    # 3) DOCUMENTS: html + fast-lane pdfs → text; the budgeted lane is
    #    excluded from the bulk pass (the skip disposition); exact
    #    dedup drops the dup page
    docs = warc_documents(
        records.join(
            F.broadcast(
                lanes.filter("lane != 'fast'")
                .selectExpr("media_id AS url")
            ),
            "url",
            "left_anti",
        )
    )
    got = docs.collect()
    # (a.html, dup.html, paper.pdf, brief.pdf) × 2 sites
    assert len(got) == 8
    assert not any("locked" in r.uri for r in got)
    from vectra_py_spark.operators.dedup import exact_dedup

    docs_tbl = docs.selectExpr(
        "uri", "text", "doc_type",
        "abs(hash(uri)) AS doc_id", "'crawl' AS source",
    )
    groups = exact_dedup(docs_tbl)
    # per site: the two identical html pages collapse, the pdfs stand
    assert groups.count() == 6

    deduped = docs_tbl.join(
        groups.select(F.col("keep_id").alias("doc_id")), "doc_id"
    )
    assert deduped.count() == 6

    # 4) QUALITY: the surviving texts score and none are empty
    from vectra_py_spark.operators.text_analysis import analyze_text

    scored = analyze_text(deduped).collect()
    assert len(scored) == 6
    assert all(r.n_words > 0 for r in scored)

    # 5) INDEX + RETRIEVAL: survivors ingest and are queryable
    from vectra_py_spark.document_index import SparkDocumentIndex

    ix = SparkDocumentIndex(
        spark, tempfile.mkdtemp() + "/ix", vector_dim=16
    )
    ix.create()
    ix.upsert_documents_df(deduped, doc_type_col="doc_type")
    res = ix.query_documents("distributed joins", max_documents=3)
    assert res.count() >= 1

    # 6) SELECTIVE RE-READ: the "read 1% of 100 TB" lever wired into
    #    the e2e (VERDICT r9 item 3) — index the same drop with
    #    index_warc, select ONLY the current HTML captures (digest
    #    dedup collapses the dup page BEFORE any download), fetch by
    #    range reads, and confirm the documents match the full-scan
    #    path while touching a selection-proportional slice of the
    #    archive bytes.
    from vectra_py_spark.sources.cdx import (
        cdx_select,
        fetch_cdx_records,
        index_warc,
        read_cdx,
    )

    cdx_dir = tempfile.mkdtemp()
    total_bytes = 0
    with open(os.path.join(cdx_dir, "index.cdxj"), "w") as idx:
        for seg in ("seg0.warc", "seg1.warc.gz"):
            p = os.path.join(d, seg)
            with open(p, "rb") as fh:
                payload = fh.read()
            total_bytes += len(payload)
            for line in index_warc(payload, p):
                idx.write(line + "\n")
    sel = cdx_select(read_cdx(spark, cdx_dir), mime="text/html")
    sel_rows = sel.collect()
    # 2 of 24 records: one html per site (the exact-dup page shares a
    # payload digest, so it never reaches the fetch stage)
    assert len(sel_rows) == 2
    sel_bytes = sum(r.length for r in sel_rows)
    assert sel_bytes < 0.15 * total_bytes  # bytes ∝ selection, not corpus
    fetched = fetch_cdx_records(spark, sel)
    assert fetched.filter("error IS NOT NULL").count() == 0
    sel_docs = {r.uri: r.text for r in warc_documents(fetched).collect()}
    full_html = {r.uri: r.text for r in got if r.uri.endswith(".html")}
    assert len(sel_docs) == 2
    for uri, text in sel_docs.items():
        assert text == full_html[uri]
