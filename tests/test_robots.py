"""robots.txt (RFC 9309) + sitemap parsing (`operators/robots.py`):
group selection, wildcard/anchor matching, longest-match precedence,
group merging, the Spark frontier filter, and sitemap/sitemapindex
extraction."""

import pytest

from vectra_py_spark.operators.robots import (
    crawl_delay,
    filter_robots_df,
    parse_robots,
    parse_sitemap,
    robots_allowed,
)

ROBOTS = """
# corpus crawl policy
User-agent: *
Disallow: /private/
Allow: /private/press/
Disallow: /*.pdf$
Crawl-delay: 2

User-agent: badbot
Disallow: /

User-agent: goodbot
Allow: /
Crawl-delay: 0.5
"""


def test_basic_matching_default_group():
    assert robots_allowed(ROBOTS, "/public/page.html")
    assert not robots_allowed(ROBOTS, "/private/secret.html")
    # longest match wins: the allow is more specific
    assert robots_allowed(ROBOTS, "/private/press/release.html")
    # wildcard + end anchor
    assert not robots_allowed(ROBOTS, "/docs/paper.pdf")
    assert robots_allowed(ROBOTS, "/docs/paper.pdf.html")
    assert crawl_delay(ROBOTS) == 2.0


def test_agent_group_selection():
    assert not robots_allowed(ROBOTS, "/anything", agent="BadBot/1.0")
    assert robots_allowed(ROBOTS, "/private/x", agent="goodbot")
    assert crawl_delay(ROBOTS, agent="goodbot") == 0.5


def test_allow_wins_length_ties_and_empty_rules():
    txt = "User-agent: *\nAllow: /dir/\nDisallow: /dir/\n"
    assert robots_allowed(txt, "/dir/x")
    # empty disallow = allow everything; empty file too
    assert robots_allowed("User-agent: *\nDisallow:\n", "/x")
    assert robots_allowed("", "/x")


def test_matching_groups_merge():
    txt = (
        "User-agent: mybot\nDisallow: /a/\n\n"
        "User-agent: mybot\nDisallow: /b/\n"
    )
    assert not robots_allowed(txt, "/a/x", agent="mybot")
    assert not robots_allowed(txt, "/b/x", agent="mybot")
    assert robots_allowed(txt, "/c/x", agent="mybot")


def test_stacked_user_agents_share_rules():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    assert not robots_allowed(txt, "/x/1", agent="a")
    assert not robots_allowed(txt, "/x/1", agent="b")
    assert robots_allowed(txt, "/x/1", agent="c")


def test_filter_robots_df(spark):
    frontier = spark.createDataFrame(
        [
            ("https://a.example/private/x", 1),
            ("https://a.example/ok", 2),
            ("https://b.example/anywhere", 3),  # no robots row
            ("https://c.example/blocked/x", 4),
        ],
        ["url", "pri"],
    )
    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow: /private/\nCrawl-delay: 3"),
            ("c.example", "User-agent: *\nDisallow: /blocked/"),
        ],
        ["host", "robots_txt"],
    )
    got = {r.url: r for r in filter_robots_df(frontier, robots).collect()}
    assert set(got) == {
        "https://a.example/ok",
        "https://b.example/anywhere",
    }
    assert got["https://a.example/ok"].crawl_delay == 3.0
    assert got["https://b.example/anywhere"].crawl_delay is None
    assert got["https://a.example/ok"].pri == 2  # columns survive


def test_parse_sitemap_urlset_and_index():
    urlset = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://ex.example/a</loc><lastmod>2026-01-01</lastmod></url>
      <url><loc>https://ex.example/b</loc></url>
    </urlset>"""
    got = parse_sitemap(urlset)
    assert got == [
        {"kind": "url", "loc": "https://ex.example/a", "lastmod": "2026-01-01"},
        {"kind": "url", "loc": "https://ex.example/b", "lastmod": None},
    ]
    index = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc>https://ex.example/sm1.xml</loc></sitemap>
    </sitemapindex>"""
    got = parse_sitemap(index.encode())
    assert got[0]["kind"] == "sitemap"
    assert got[0]["loc"] == "https://ex.example/sm1.xml"
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap("<urlset><url>")


def test_sitemap_urls_discovery():
    from vectra_py_spark.operators.robots import sitemap_urls

    txt = (
        "Sitemap: https://a.example/sm.xml\n"
        "User-agent: *\nDisallow: /private/\n"
        "sitemap: https://a.example/sm2.xml  # inline comment\n"
        "Sitemap:\n"  # empty value ignored
        "NotASitemap: https://x/\n"
    )
    assert sitemap_urls(txt) == [
        "https://a.example/sm.xml", "https://a.example/sm2.xml",
    ]
    # sitemap lines never disturb group parsing
    from vectra_py_spark.operators.robots import robots_allowed
    assert not robots_allowed(txt, "/private/x")
    assert sitemap_urls("") == []
