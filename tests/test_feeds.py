"""RSS/Atom feed parsing (`operators/feeds.py`)."""

import pytest

from vectra_py_spark.operators.feeds import feed_entries_df, parse_feed

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Site News</title>
  <item><title>Post 1</title><link>https://s.example/p1</link>
    <pubDate>Mon, 10 Aug 2026 10:00:00 GMT</pubDate>
    <guid>p1-guid</guid></item>
  <item><title>Post 2</title><link>https://s.example/p2</link></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Blog</title>
  <entry>
    <title>Entry A</title>
    <link rel="self" href="https://b.example/a.atom"/>
    <link rel="alternate" href="https://b.example/a"/>
    <updated>2026-08-01T00:00:00Z</updated>
    <id>tag:a</id>
  </entry>
  <entry><title>Entry B</title><link href="https://b.example/b"/></entry>
</feed>"""


def test_parse_rss():
    feed = parse_feed(RSS)
    assert feed["kind"] == "rss" and feed["title"] == "Site News"
    assert [e["link"] for e in feed["entries"]] == [
        "https://s.example/p1", "https://s.example/p2",
    ]
    assert feed["entries"][0]["published"].startswith("Mon, 10 Aug")
    assert feed["entries"][0]["id"] == "p1-guid"


def test_parse_atom_link_selection():
    feed = parse_feed(ATOM.encode())
    assert feed["kind"] == "atom" and feed["title"] == "Atom Blog"
    a, b = feed["entries"]
    # alternate beats self regardless of document order
    assert a["link"] == "https://b.example/a"
    assert a["published"] == "2026-08-01T00:00:00Z"
    assert a["id"] == "tag:a"
    assert b["link"] == "https://b.example/b"  # unrel'd counts as alternate


def test_malformed_contract():
    with pytest.raises(ValueError, match="malformed"):
        parse_feed("<rss><channel>")
    with pytest.raises(ValueError, match="not a feed"):
        parse_feed("<html></html>")
    with pytest.raises(ValueError, match="channel"):
        parse_feed("<rss></rss>")


def test_feed_entries_df(spark):
    df = spark.createDataFrame(
        [
            ("https://s.example/rss.xml", bytearray(RSS.encode())),
            ("https://b.example/atom.xml", bytearray(ATOM.encode())),
            ("https://bad.example/f.xml", bytearray(b"<nope")),
        ],
        "url STRING, payload BINARY",
    )
    rows = feed_entries_df(df).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    assert len(by_kind["rss"]) == 2 and len(by_kind["atom"]) == 2
    assert {r.link for r in by_kind["atom"]} == {
        "https://b.example/a", "https://b.example/b",
    }
    (err,) = by_kind["error"]
    assert err.feed_url == "https://bad.example/f.xml"
    assert "malformed" in err.feed_title
