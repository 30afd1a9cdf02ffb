"""The acquisition loop end-to-end: seed → fetch wave → outlinks →
frontier (canonical dedup + crawled anti-join + robots + PageRank
priority + per-host cap) → next wave → boilerplate removal → corpus.
The "fetch" is a join against a synthetic web snapshot (url, html) —
the same shape as replaying a WARC capture, and exactly how a
distributed crawler consumes a fetch log."""

import pytest

from pyspark.sql import functions as F

from vectra_py_spark.functions.urls import canonical_url
from vectra_py_spark.operators.boilerplate import main_content_df
from vectra_py_spark.operators.linkgraph import (
    crawl_frontier,
    host_graph,
    host_pagerank,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

PROSE = (
    "It was the considered view of the committee that the proposal "
    "should be adopted in full, and that the budget which came with "
    "it ought to be approved by all of the members who were present "
    "at the meeting, because the alternative would have been to do "
    "nothing at all and that was not an option anyone wanted."
)

NAV = (
    '<nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></nav>'
)


def _page(links: list[str], n_paras: int = 2) -> str:
    body = "".join(f"<p>{PROSE}</p>" for _ in range(n_paras))
    extra = "".join(f'<a href="{u}">link</a>' for u in links)
    return f"<html><body>{NAV}{body}<div>{extra}</div></body></html>"


def _web(spark):
    """A 3-host synthetic web: a hub linking to articles, articles
    linking onward (depth 2), and a robots-blocked spam host that
    everything links to but nothing may fetch."""
    rows = {
        "https://hub.example/": _page(
            [
                "https://content.example/a1",
                "https://content.example/a2",
                "https://spam.example/buy",
            ],
            n_paras=1,
        ),
        "https://content.example/a1": _page(
            ["https://content.example/a3", "https://spam.example/buy"]
        ),
        "https://content.example/a2": _page(
            ["https://content.example/a3"]
        ),
        # depth-2 page, only reachable in wave 3
        "https://content.example/a3": _page([]),
        "https://spam.example/buy": _page([], n_paras=1),
    }
    return spark.createDataFrame(
        list(rows.items()), ["url", "text"]
    ).withColumn("ckey", canonical_url("url"))


def test_crawl_loop_reaches_depth2_and_respects_robots(spark):
    web = _web(spark).cache()
    robots = spark.createDataFrame(
        [("spam.example", "User-agent: *\nDisallow: /")],
        ["host", "robots_txt"],
    )
    # each wave MATERIALIZES (as a real crawler does — the fetch log is
    # storage, not lineage): letting three waves of frontier plans nest
    # lazily multiplies the DAG (pagerank joins x windows x unions)
    # into driver-OOM territory, which is itself the scale lesson
    crawled: set[str] = set()
    wave = ["https://hub.example/"]
    fetched_pages = None
    for _ in range(3):
        crawled |= set(wave)
        fetched_pages = (
            web.filter(F.col("url").isin(sorted(crawled)))
            .select("url", "text")
        )
        ranks = host_pagerank(host_graph(fetched_pages), iterations=5)
        crawled_df = spark.createDataFrame(
            [(u,) for u in sorted(crawled)], "url string"
        )
        frontier = crawl_frontier(
            fetched_pages,
            crawled_df,
            robots=robots,
            ranks=ranks,
            per_host_limit=5,
        )
        wave = [r.url for r in frontier.select("url").collect()]

    got = sorted(r.url for r in fetched_pages.select("url").distinct().collect())
    # all content reached, incl. the depth-2 page; spam never fetched
    assert got == [
        "https://content.example/a1",
        "https://content.example/a2",
        "https://content.example/a3",
        "https://hub.example/",
    ]

    # after the final wave the frontier is empty: everything allowed
    # is crawled, spam is robots-blocked
    crawled_df = spark.createDataFrame(
        [(u,) for u in sorted(crawled)], "url string"
    )
    assert crawl_frontier(
        fetched_pages, crawled_df, robots=robots
    ).count() == 0

    # boilerplate removal turns fetched pages into a corpus: prose
    # stays, chrome goes
    docs = main_content_df(fetched_pages).collect()
    by_url = {r.url: r for r in docs}
    a1 = by_url["https://content.example/a1"]
    assert PROSE in a1.main_text
    assert "Home" not in a1.main_text
    assert all(r.boiler_ratio > 0.0 for r in docs)

    # the link-graph priority is sane: content.example (linked by hub
    # and itself... from hub + internal links) outranks the dangling
    # hub that nothing links to
    ranks = {
        r.host: r.rank
        for r in host_pagerank(host_graph(fetched_pages), iterations=8).collect()
    }
    assert ranks["content.example"] > ranks["hub.example"]
