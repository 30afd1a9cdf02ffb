"""Crawl-frontier composition (`linkgraph.crawl_frontier`): outlinks →
canonical dedup → crawled anti-join → robots filter → pagerank
priority → per-host cap, end to end on synthetic pages."""

import pytest

from vectra_py_spark.operators.linkgraph import (
    crawl_frontier,
    host_graph,
    host_pagerank,
)


def _pages(spark):
    rows = [
        (
            "https://hub.example/index.html",
            # two spellings of the same target → canonical dedup;
            # one already-crawled target; robots-blocked target;
            # plus links to big.example
            '<a href="https://new.example/page?utm_source=x">n</a>'
            '<a href="https://www.new.example/page">n2</a>'
            '<a href="https://hub.example/crawled.html">old</a>'
            '<a href="https://blocked.example/private/x">b</a>'
            + "".join(
                f'<a href="https://big.example/{i}">big</a>'
                for i in range(5)
            ),
        ),
        (
            "https://other.example/a",
            '<a href="https://new.example/page#frag">n3</a>'
            '<a href="https://big.example/0">big0</a>',
        ),
    ]
    return spark.createDataFrame(rows, ["url", "text"])


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_crawl_frontier_full_composition(spark):
    pages = _pages(spark)
    crawled = spark.createDataFrame(
        [("https://hub.example/crawled.html",),
         ("https://hub.example/index.html",),
         ("https://other.example/a",)],
        ["url"],
    )
    robots = spark.createDataFrame(
        [("blocked.example", "User-agent: *\nDisallow: /private/")],
        ["host", "robots_txt"],
    )
    edges = host_graph(pages)
    ranks = host_pagerank(edges, iterations=5)

    got = crawl_frontier(
        pages, crawled, robots=robots, ranks=ranks, per_host_limit=2
    ).collect()
    urls = [r.url for r in got]
    # canonical dedup folded three spellings of new.example/page into
    # one candidate, keeping the bytewise-min original spelling
    new_rows = [r for r in got if r.host == "new.example"]
    assert len(new_rows) == 1
    assert new_rows[0].n_refs == 2  # two distinct referring pages
    # crawled page never re-enters; robots-blocked never enters
    assert "https://hub.example/crawled.html" not in urls
    assert not any("blocked.example" in u for u in urls)
    # per-host cap: big.example contributed 5 links, capped at 2
    assert sum(r.host == "big.example" for r in got) == 2
    # priority: every row carries rank; big.example (most linked) has
    # the highest rank and sorts first
    assert got[0].host == "big.example"
    assert all(r.rank >= 0.0 for r in got)


def test_crawl_frontier_minimal(spark):
    pages = spark.createDataFrame(
        [("https://a.example/", '<a href="https://b.example/x">b</a>')],
        ["url", "text"],
    )
    crawled = spark.createDataFrame([("https://never.example/",)], ["url"])
    got = crawl_frontier(pages, crawled).collect()
    assert [r.url for r in got] == ["https://b.example/x"]
    assert got[0].rank == 0.0 and got[0].n_refs == 1
