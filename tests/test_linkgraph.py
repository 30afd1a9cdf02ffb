"""Host link graph + PageRank (`operators/linkgraph.py`): Catalyst
outlink/host classification, edge aggregation, degree stats, power
iteration vs an independent dense numpy reference, and full-URL
outlink resolution (urljoin semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.linkgraph import (
    host_degrees,
    host_edges,
    host_graph,
    host_hits,
    host_pagerank,
    outlinks_df,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

PAGE = """
<html><body>
<a href="https://other.example/page">abs</a>
<a href="HTTP://WWW.Upper.Example/x">case+www</a>
<a href="//proto.example/y">protocol-relative</a>
<a href="/root-relative">same host</a>
<a href="sibling.html">relative</a>
<a href="mailto:x@example.com">mail</a>
<a href="javascript:void(0)">js</a>
<a href="urn:isbn:123">other scheme</a>
<a href="#frag">fragment only</a>
<a href='https://single.example/q'>single quotes</a>
</body></html>
"""


def test_host_edges_classification(spark):
    df = spark.createDataFrame(
        [("https://www.src.example/dir/page.html", PAGE)],
        ["url", "text"],
    )
    got = sorted(
        (r.src, r.dst) for r in host_edges(df).collect()
    )
    # self-loops (root-relative, relative, bare fragment) dropped by
    # default; mailto/javascript/urn dropped always
    assert got == [
        ("src.example", "other.example"),
        ("src.example", "proto.example"),
        ("src.example", "single.example"),
        ("src.example", "upper.example"),
    ]
    with_self = sorted(
        (r.src, r.dst)
        for r in host_edges(df, drop_self=False).collect()
    )
    # root-relative + relative + fragment-only → three self edges
    assert with_self.count(("src.example", "src.example")) == 3


def test_host_graph_weights(spark):
    html = (
        '<a href="https://a.example/1">x</a>'
        '<a href="https://a.example/2">y</a>'
        '<a href="https://b.example/">z</a>'
    )
    df = spark.createDataFrame(
        [("https://s.example/", html), ("https://s.example/p2", html)],
        ["url", "text"],
    )
    got = {
        (r.src, r.dst): r.n_links for r in host_graph(df).collect()
    }
    assert got == {
        ("s.example", "a.example"): 4,
        ("s.example", "b.example"): 2,
    }


def test_host_degrees(spark):
    edges = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "c", 2)],
        ["src", "dst", "n_links"],
    )
    got = {r.host: r for r in host_degrees(edges).collect()}
    assert got["a"].out_degree == 2 and got["a"].in_degree == 0
    assert got["a"].out_links == 4
    assert got["c"].in_degree == 2 and got["c"].in_links == 3
    assert got["c"].out_degree == 0
    assert got["b"].out_degree == 1 and got["b"].in_degree == 1


def _ref_pagerank(hosts, edges, d, iters):
    """Independent dense power iteration, same semantics: weighted
    split, uniform teleport, dangling mass recovered as 1 - flowed."""
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    W = np.zeros((n, n))
    for s, t, w in edges:
        W[idx[s], idx[t]] += w
    out_w = W.sum(axis=1)
    P = np.divide(
        W, out_w[:, None], out=np.zeros_like(W), where=out_w[:, None] > 0
    )
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = r @ P
        flowed = contrib.sum()
        r = (1 - d) / n + d * (contrib + (1 - flowed) / n)
    return {h: r[idx[h]] for h in hosts}


def test_host_pagerank_matches_dense_reference(spark):
    # includes a dangling node (d) and a weighted multi-edge
    edges = [
        ("a", "b", 2.0),
        ("a", "c", 1.0),
        ("b", "c", 1.0),
        ("c", "a", 1.0),
        ("c", "d", 3.0),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "n_links"])
    got = {
        r.host: r.rank
        for r in host_pagerank(df, damping=0.85, iterations=12).collect()
    }
    want = _ref_pagerank(
        ["a", "b", "c", "d"], edges, d=0.85, iters=12
    )
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], rel=1e-9)
    # rank mass is conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # the hub pointed at by everything outranks the dangling sink's
    # teleport-only floor
    assert got["c"] > got["d"] > 0


def test_host_pagerank_unweighted_and_validation(spark):
    edges = [("a", "b", 100.0), ("a", "c", 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "n_links"])
    w = {
        r.host: r.rank
        for r in host_pagerank(df, iterations=3).collect()
    }
    u = {
        r.host: r.rank
        for r in host_pagerank(df, iterations=3, weighted=False).collect()
    }
    assert w["b"] > w["c"]  # weight-proportional split
    assert u["b"] == pytest.approx(u["c"], rel=1e-12)  # uniform split
    with pytest.raises(ValueError, match="damping"):
        host_pagerank(df, damping=1.5)
    with pytest.raises(ValueError, match="iterations"):
        host_pagerank(df, iterations=0)


def _ref_ppr(hosts, edges, seeds, d, iters):
    """Dense personalized power iteration, same semantics."""
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    W = np.zeros((n, n))
    for s, t_, w in edges:
        W[idx[s], idx[t_]] += w
    out_w = W.sum(axis=1)
    P = np.divide(
        W, out_w[:, None], out=np.zeros_like(W), where=out_w[:, None] > 0
    )
    t = np.zeros(n)
    for s in seeds:
        t[idx[s]] = 1.0 / len(seeds)
    r = t.copy()
    for _ in range(iters):
        contrib = r @ P
        flowed = contrib.sum()
        r = (1 - d) * t + d * (contrib + (1 - flowed) * t)
    return {h: r[idx[h]] for h in hosts}


def test_host_pagerank_personalized(spark):
    """Trust propagation: teleport restricted to a seed set; a
    link-farm component unreachable from the seeds scores exactly 0;
    values match the dense reference."""
    edges = [
        ("seed.example", "good.example", 1.0),
        ("good.example", "also.example", 2.0),
        ("also.example", "seed.example", 1.0),
        # densely interlinked farm, no inbound path from the seeds
        ("farm1.example", "farm2.example", 50.0),
        ("farm2.example", "farm1.example", 50.0),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "n_links"])
    seeds = spark.createDataFrame([("seed.example",)], ["host"])
    got = {
        r.host: r.rank
        for r in host_pagerank(
            df, iterations=10, seeds=seeds
        ).collect()
    }
    hosts = ["seed.example", "good.example", "also.example",
             "farm1.example", "farm2.example"]
    want = _ref_ppr(hosts, edges, ["seed.example"], 0.85, 10)
    for h in hosts:
        assert got[h] == pytest.approx(want[h], rel=1e-9, abs=1e-15)
    assert got["farm1.example"] == 0.0 and got["farm2.example"] == 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # the trusted component holds ALL the mass (good.example can
    # legitimately outrank the seed — it receives the seed's whole
    # outflow); what matters is both are > 0 while the farm is 0
    assert got["seed.example"] > 0 and got["good.example"] > 0
    # seeds that never appear in the graph are an error, not silence
    with pytest.raises(ValueError, match="no seed host"):
        host_pagerank(
            df, seeds=spark.createDataFrame([("absent.example",)], ["host"])
        )


def _ref_hits(hosts, edges, iters):
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    W = np.zeros((n, n))
    for s, t_, w in edges:
        W[idx[s], idx[t_]] += w
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iters):
        a = h @ W
        if a.sum():
            a = a / a.sum()
        h = W @ a
        if h.sum():
            h = h / h.sum()
    return (
        {x: h[idx[x]] for x in hosts},
        {x: a[idx[x]] for x in hosts},
    )


def test_host_hits_matches_dense_reference(spark):
    edges = [
        ("hub1", "auth1", 2.0),
        ("hub1", "auth2", 1.0),
        ("hub2", "auth1", 1.0),
        ("auth1", "hub1", 1.0),  # a backlink; also gives auth1 a hub side
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "n_links"])
    got = {
        r.host: (r.hub, r.authority)
        for r in host_hits(df, iterations=7).collect()
    }
    hosts = ["hub1", "hub2", "auth1", "auth2"]
    H, A = _ref_hits(hosts, edges, 7)
    for x in hosts:
        assert got[x][0] == pytest.approx(H[x], rel=1e-9, abs=1e-15)
        assert got[x][1] == pytest.approx(A[x], rel=1e-9, abs=1e-15)
    # the directory outranks others as hub; the cited page as authority
    assert got["hub1"][0] == max(v[0] for v in got.values())
    assert got["auth1"][1] == max(v[1] for v in got.values())
    # L1 normalization: each score family sums to 1
    assert sum(v[0] for v in got.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(v[1] for v in got.values()) == pytest.approx(1.0, abs=1e-12)
    with pytest.raises(ValueError, match="iterations"):
        host_hits(df, iterations=0)


def test_host_hits_offphase_checkpoint_interval(spark):
    """An interval whose phase misses the last iteration (3 over 4)
    must still produce identical values — the final iteration now
    truncates unconditionally (ADVICE r12), which is a lineage/perf
    change only."""
    edges = [
        ("hub1", "auth1", 2.0),
        ("hub1", "auth2", 1.0),
        ("hub2", "auth1", 1.0),
        ("auth1", "hub1", 1.0),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "n_links"])
    base = {
        r.host: (r.hub, r.authority)
        for r in host_hits(df, iterations=4, checkpoint_interval=1)
        .collect()
    }
    off = {
        r.host: (r.hub, r.authority)
        for r in host_hits(df, iterations=4, checkpoint_interval=3)
        .collect()
    }
    assert base == off


def test_host_components(spark):
    from vectra_py_spark.operators.linkgraph import host_components

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("x", "y", 1)],
        ["src", "dst", "n_links"],
    )
    got = {r.host: r.component for r in host_components(edges).collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"]
    assert got["a"] != got["x"]


def test_outlinks_df_urljoin_semantics(spark):
    html = (
        '<a href="../up/x.html">dots</a>'
        '<a href="sib.html?q=1">relative</a>'
        '<a href="/abs/path">root</a>'
        '<a href="//cdn.example/lib.js">proto-rel</a>'
        '<a href="https://ext.example/e">absolute</a>'
        '<a href="mailto:a@b">skip</a>'
    )
    df = spark.createDataFrame(
        [("https://h.example/a/b/page.html", html)], ["url", "text"]
    )
    got = sorted(r.outlink for r in outlinks_df(df).collect())
    assert got == [
        "https://cdn.example/lib.js",
        "https://ext.example/e",
        "https://h.example/a/b/sib.html?q=1",
        "https://h.example/a/up/x.html",
        "https://h.example/abs/path",
    ]
    assert all(
        r.src_url == "https://h.example/a/b/page.html"
        for r in outlinks_df(df).collect()
    )


def test_schedule_fetches_polite_slots(spark):
    """Per host: priority-ordered slots at (k-1)*delay, robots
    crawl_delay honored when present, one worker per host."""
    from vectra_py_spark.operators.linkgraph import schedule_fetches

    frontier = spark.createDataFrame(
        [
            # host a: delay 2.0, ranks tie -> n_refs desc, url asc
            ("https://a.example/x", "a.example", 3, 0.5, 2.0),
            ("https://a.example/y", "a.example", 9, 0.5, 2.0),
            ("https://a.example/z", "a.example", 3, 0.5, 2.0),
            # host b: no crawl_delay (null) -> default 1.5
            ("https://b.example/p", "b.example", 1, 0.9, None),
            ("https://b.example/q", "b.example", 1, 0.1, None),
        ],
        "url STRING, host STRING, n_refs INT, rank DOUBLE, "
        "crawl_delay DOUBLE",
    )
    got = {
        r.url: (r.slot, r.fetch_at_s, r.worker)
        for r in schedule_fetches(
            frontier, default_delay=1.5, n_workers=4
        ).collect()
    }
    assert got["https://a.example/y"][:2] == (1, 0.0)   # n_refs 9 first
    assert got["https://a.example/x"][:2] == (2, 2.0)   # url tiebreak
    assert got["https://a.example/z"][:2] == (3, 4.0)
    assert got["https://b.example/p"][:2] == (1, 0.0)   # rank 0.9 first
    assert got["https://b.example/q"][:2] == (2, 1.5)   # default delay
    # one worker per host (politeness across distributed fetchers)
    workers = {}
    for url, (_s, _t, w) in got.items():
        h = url.split("/")[2]
        assert workers.setdefault(h, w) == w
    import pytest as _pytest

    with _pytest.raises(ValueError):
        schedule_fetches(frontier, n_workers=0)
