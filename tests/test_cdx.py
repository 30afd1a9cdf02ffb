"""CDX(J) crawl-index path (`sources/cdx.py`): SURT transform, line
codec, from-scratch WARC indexer (offsets from gzip framing), the
Catalyst index reader, the read planner (latest/digest dedup), and
the range-read fetcher — round-tripped against the full-scan path."""

import gzip
import os
import tempfile

import pytest

from vectra_py_spark.sources.cdx import (
    cdx_select,
    fetch_cdx_records,
    format_cdxj_line,
    index_warc,
    parse_cdxj_line,
    read_cdx,
    surt_key,
)
from vectra_py_spark.sources.warc import parse_warc, synth_warc


def test_surt_key():
    assert surt_key("https://www.Example.org/Docs/A?q=1") == \
        "org,example)/docs/a?q=1"
    assert surt_key("http://sub.site.example.co.uk/") == \
        "uk,co,example,site,sub)/"
    assert surt_key("https://example.org:8443/x") == \
        "org,example:8443)/x"
    assert surt_key("https://example.org") == "org,example)/"


def test_cdxj_line_roundtrip_and_malformed():
    entry = {
        "surt": "org,example)/a", "ts": "20260101120000",
        "url": "https://example.org/a", "mime": "text/html",
        "status": 200, "digest": "sha1:ABC", "filename": "f.warc.gz",
        "offset": 123, "length": 456,
    }
    assert parse_cdxj_line(format_cdxj_line(entry)) == entry
    with pytest.raises(ValueError, match="3 fields"):
        parse_cdxj_line("only two")
    with pytest.raises(ValueError, match="JSON"):
        parse_cdxj_line("a b {broken")
    with pytest.raises(ValueError, match="filename"):
        parse_cdxj_line('a b {"url": "x"}')
    with pytest.raises(ValueError, match="offset"):
        parse_cdxj_line('a b {"filename": "f", "offset": "x", "length": "1"}')


PAGES = [
    ("https://a.example/one", b"<html>page one body</html>", "text/html"),
    ("https://a.example/two", b"<html>page two body</html>", "text/html"),
    # exact mirror of /one on another host -> same digest
    ("https://m.example/mirror", b"<html>page one body</html>", "text/html"),
    ("https://a.example/data.bin", b"\x00\x01binary", "application/octet-stream"),
]


@pytest.mark.parametrize("compress", [False, True])
def test_index_warc_offsets_are_fetchable(compress):
    """The independent-path check: the indexer derives offsets from
    container framing; slicing those ranges back out of the archive
    and parsing each must reproduce exactly the full-scan records."""
    payload = synth_warc(PAGES, compress=compress)
    lines = index_warc(payload, "seg0.warc" + (".gz" if compress else ""))
    entries = [parse_cdxj_line(ln) for ln in lines]
    assert len(entries) == 4  # responses only, warcinfo skipped
    full = {r["url"]: r for r in parse_warc(payload)
            if r["warc_type"] == "response"}
    for e in entries:
        raw = payload[e["offset"]: e["offset"] + e["length"]]
        recs = parse_warc(raw)
        assert len(recs) == 1
        assert recs[0]["payload"] == full[e["url"]]["payload"]
    # mirror shares the digest of /one
    by_url = {e["url"]: e for e in entries}
    assert by_url["https://m.example/mirror"]["digest"] == \
        by_url["https://a.example/one"]["digest"]
    assert by_url["https://a.example/data.bin"]["mime"] == \
        "application/octet-stream"


@pytest.mark.slow
def test_cdx_spark_path_end_to_end(spark):
    """WARC segments → indexer → .cdx.gz on disk → Catalyst reader →
    planner (mime+digest dedup) → range fetcher == full-scan payloads,
    while fetching FEWER ranges than there are captures."""
    d = tempfile.mkdtemp()
    seg = os.path.join(d, "seg0.warc.gz")
    payload = synth_warc(PAGES, compress=True)
    with open(seg, "wb") as f:
        f.write(payload)
    lines = index_warc(payload, seg)
    # one malformed line must quarantine silently in the reader
    cdx_path = os.path.join(d, "index.cdx.gz")
    with gzip.open(cdx_path, "wt") as f:
        f.write("\n".join(lines + ["corrupt line without json"]) + "\n")

    idx = read_cdx(spark, cdx_path)
    assert idx.count() == 4  # malformed line dropped

    sel = cdx_select(idx, mime="text/html")
    picked = sel.collect()
    # 3 html captures, digest-dedup removes the mirror → 2 fetches
    assert len(picked) == 2
    got = {r.url: r for r in fetch_cdx_records(sel).collect()}
    assert set(got) == {"https://a.example/one", "https://a.example/two"}
    assert bytes(got["https://a.example/one"].payload) == \
        b"<html>page one body</html>"
    assert all(r.error is None for r in got.values())
    assert all(r.http_status == 200 for r in got.values())

    # SURT prefix selection: the whole a.example site
    site = cdx_select(
        idx, url_prefix=surt_key("https://a.example/"), dedup_digest=False
    )
    assert site.count() == 3

    # bad offset quarantines, never fails the stage
    import pyspark.sql.functions as F
    bad = sel.limit(1).withColumn("offset", F.lit(10_000_000).cast("bigint"))
    rows = fetch_cdx_records(bad).collect()
    assert len(rows) == 1 and rows[0].error is not None


def test_index_warc_corrupt_deflate_is_valueerror():
    """Fuzz-campaign regression (round 9, seed family warc_index):
    corrupt deflate bytes behind a WELL-FORMED gzip header leaked
    zlib.error through index_warc — the quarantine layers catch
    exactly ValueError, so anything else is a failed stage."""
    payload = bytearray(synth_warc(
        [("https://a.example/x", b"body", "text/html")], compress=True
    ))
    for i in range(12, min(40, len(payload))):
        payload[i] ^= 0xA5  # shred the deflate stream, keep the header
    with pytest.raises(ValueError):
        index_warc(bytes(payload), "f.warc.gz")


def test_cdx_select_latest_only(spark):
    rows = [
        ("org,a)/p", "20250101000000", "https://a/p", "text/html", 200,
         "sha1:OLD", "f1", 0, 10),
        ("org,a)/p", "20260101000000", "https://a/p", "text/html", 200,
         "sha1:NEW", "f2", 0, 10),
        ("org,b)/q", "20240101000000", "https://b/q", "text/html", 404,
         "sha1:ERR", "f3", 0, 10),
    ]
    df = spark.createDataFrame(
        rows,
        "surt STRING, ts STRING, url STRING, mime STRING, status INT, "
        "digest STRING, filename STRING, offset BIGINT, length BIGINT",
    )
    got = cdx_select(df).collect()
    # latest capture of /p wins; the 404 is filtered by status=200
    assert len(got) == 1
    assert got[0].digest == "sha1:NEW"
    got_all = cdx_select(df, status=None, latest_only=False).count()
    assert got_all == 3


def test_index_warc_highly_compressible_member():
    """ADVICE r9 (low): a gzip member whose output zlib caps at
    max_length with ALL input consumed (tiny compressed size, huge
    expansion) must index fine — the old loop mistook the buffered
    output for a truncated member."""
    body = b"a" * (3 << 20)  # 3 MiB of one byte ≈ 3 KiB gzipped
    payload = synth_warc(
        [("https://big.example/a", body, "text/plain")], compress=True
    )
    lines = index_warc(payload, "big.warc.gz")
    entries = [parse_cdxj_line(ln) for ln in lines]
    urls = {e["url"] for e in entries if e.get("url")}
    assert "https://big.example/a" in urls


def test_index_warc_truly_truncated_member_still_raises():
    """The flush path must not mask REAL truncation: chopping the
    compressed stream mid-member still raises ValueError."""
    body = b"b" * (3 << 20)
    payload = synth_warc(
        [("https://big.example/b", body, "text/plain")], compress=True
    )
    with pytest.raises(ValueError):
        index_warc(payload[: len(payload) // 2], "cut.warc.gz")
