"""Round-9 crawl glue: WARC → host graph directly
(`warc_host_graph`), sitemap payloads → frontier seeds
(`sitemap_entries_df`), and CDX capture history → recrawl scheduling
(`recrawl_priority`)."""

import math
import os
import tempfile

import pytest

from vectra_py_spark.operators.linkgraph import warc_host_graph
from vectra_py_spark.operators.robots import sitemap_entries_df
from vectra_py_spark.sources.cdx import recrawl_priority
from vectra_py_spark.sources.warc import read_warc, synth_warc


@pytest.mark.slow
def test_warc_host_graph(spark):
    html1 = (
        b'<html><body><a href="https://t1.example/x">a</a>'
        b'<a href="https://t2.example/y">b</a></body></html>'
    )
    html2 = b'<html><body><a href="https://t1.example/z">c</a></body></html>'
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "seg.warc"), "wb") as f:
        f.write(synth_warc([
            ("https://src.example/a", html1, "text/html"),
            ("https://src.example/b", html2, "text/html"),
            # non-HTML response must not contribute edges
            ("https://src.example/d.bin", b"\xff\xfebinary<a href='https://t9.example/'>", "application/octet-stream"),
        ]))
    records = read_warc(spark, d)
    got = {
        (r.src, r.dst): r.n_links
        for r in warc_host_graph(records).collect()
    }
    assert got == {
        ("src.example", "t1.example"): 2,
        ("src.example", "t2.example"): 1,
    }


def test_sitemap_entries_df(spark):
    urlset = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://ex.example/a</loc>"
        "<lastmod>2026-02-03</lastmod></url>"
        "<url><loc>https://ex.example/b</loc></url></urlset>"
    ).encode()
    index = (
        "<sitemapindex><sitemap><loc>https://ex.example/sm2.xml</loc>"
        "</sitemap></sitemapindex>"
    ).encode()
    df = spark.createDataFrame(
        [
            ("https://ex.example/sitemap.xml", bytearray(urlset)),
            ("https://ex.example/smidx.xml", bytearray(index)),
            ("https://ex.example/broken.xml", bytearray(b"<urlset><url>")),
        ],
        "url STRING, payload BINARY",
    )
    rows = sitemap_entries_df(df).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    assert {r.loc for r in by_kind["url"]} == {
        "https://ex.example/a", "https://ex.example/b",
    }
    assert next(
        r for r in by_kind["url"] if r.loc == "https://ex.example/a"
    ).lastmod == "2026-02-03"
    assert by_kind["sitemap"][0].loc == "https://ex.example/sm2.xml"
    err = by_kind["error"][0]
    assert err.sitemap_url == "https://ex.example/broken.xml"
    assert "malformed" in err.lastmod


def test_recrawl_priority(spark):
    rows = [
        # volatile page: 3 captures, 3 versions, last seen 2 days ago
        ("org,a)/hot", "20260801000000", "https://a/hot", "d1"),
        ("org,a)/hot", "20260808000000", "https://a/hot", "d2"),
        ("org,a)/hot", "20260814000000", "https://a/hot", "d3"),
        # static page: 3 captures, 1 version, last seen 2 days ago
        ("org,a)/static", "20260801000000", "https://a/static", "s1"),
        ("org,a)/static", "20260808000000", "https://a/static", "s1"),
        ("org,a)/static", "20260814000000", "https://a/static", "s1"),
        # single capture: no change evidence yet
        ("org,b)/new", "20260815120000", "https://b/new", "n1"),
    ]
    df = spark.createDataFrame(rows, "surt STRING, ts STRING, url STRING, digest STRING")
    got = {r.surt: r for r in recrawl_priority(df, "20260816000000").collect()}
    hot = got["org,a)/hot"]
    assert hot.n_captures == 3 and hot.n_versions == 3
    assert hot.change_rate == 1.0
    assert hot.age_days == 2.0
    assert hot.priority == pytest.approx(math.log1p(2.0), abs=1e-6)
    static = got["org,a)/static"]
    assert static.change_rate == 0.0 and static.priority == 0.0
    new = got["org,b)/new"]
    assert new.change_rate == 0.0 and new.priority == 0.0
    assert new.age_days == pytest.approx(0.5, abs=1e-6)
    # the queue orders the volatile page first
    ordered = [r.surt for r in recrawl_priority(
        df, "20260816000000"
    ).orderBy("priority", ascending=False).collect()]
    assert ordered[0] == "org,a)/hot"


def test_warc_host_graph_invalid_utf8_page(spark):
    """ADVICE r9 (high): a mis-labeled non-UTF-8 text/html page must
    quarantine to replacement chars, not kill the job — links in the
    valid part of the page still contribute edges."""
    page = (
        b'<html><body>caf\xe9 \xff\xfe '
        b'<a href="https://t1.example/x">a</a></body></html>'
    )
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "seg.warc"), "wb") as f:
        f.write(synth_warc([
            ("https://src.example/latin1", page, "text/html"),
        ]))
    got = {
        (r.src, r.dst): r.n_links
        for r in warc_host_graph(read_warc(spark, d)).collect()
    }
    assert got == {("src.example", "t1.example"): 1}
