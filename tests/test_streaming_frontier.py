"""Streaming crawl frontier (`streaming/frontier.py`): two waves of
fetched pages through the continuous loop — queued-once semantics
across batches, robots filtering, spelling-variant collapse, and
replay idempotence via the batch-id store."""

import os
import tempfile

from pyspark.sql import functions as F

from vectra_py_spark.streaming.frontier import stream_frontier
import pytest


def _write_pages(spark, path, rows):
    spark.createDataFrame(rows, ["url", "text"]).write.mode(
        "append"
    ).parquet(path)


def _stream(spark, path):
    return (
        spark.readStream.schema("url STRING, text STRING")
        .option("maxFilesPerTrigger", 100)
        .parquet(path)
    )


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_stream_frontier_two_waves(spark):
    src = os.path.join(tempfile.mkdtemp(), "pages")
    seen = os.path.join(tempfile.mkdtemp(), "seen")
    out = os.path.join(tempfile.mkdtemp(), "frontier")
    ckpt = os.path.join(tempfile.mkdtemp(), "ckpt")
    robots = spark.createDataFrame(
        [("spam.example", "User-agent: *\nDisallow: /")],
        ["host", "robots_txt"],
    )

    # wave 1: the hub links to A (twice, two spellings), B, and spam
    _write_pages(spark, src, [(
        "https://hub.example/",
        '<a href="https://a.example/page?utm_source=x">1</a>'
        '<a href="https://www.a.example/page">2</a>'
        '<a href="https://b.example/p">3</a>'
        '<a href="https://spam.example/buy">4</a>',
    )])
    q = stream_frontier(
        _stream(spark, src), seen, out, ckpt, robots=robots,
        per_host_limit=5,
    )
    q.awaitTermination(120)
    w1 = spark.read.parquet(out).collect()
    by_host = {r.host: r for r in w1}
    assert set(by_host) == {"a.example", "b.example"}  # spam blocked
    # two spellings collapsed into one candidate with n_refs=1 source
    assert by_host["a.example"].n_refs == 1
    assert by_host["a.example"].url == "https://a.example/page?utm_source=x"

    # wave 2: page A arrives (crawled), links to B (already queued),
    # itself (crawled), and C (new)
    _write_pages(spark, src, [(
        "https://a.example/page",
        '<a href="https://b.example/p">x</a>'
        '<a href="https://a.example/page#top">self</a>'
        '<a href="https://c.example/new">y</a>',
    )])
    q2 = stream_frontier(
        _stream(spark, src), seen, out, ckpt, robots=robots,
        per_host_limit=5,
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    hosts = sorted(r.host for r in rows)
    # only C is new in wave 2
    assert hosts == ["a.example", "b.example", "c.example"]

    # replay idempotence: a fresh query over the same source with the
    # same checkpoint reprocesses nothing and changes nothing
    q3 = stream_frontier(
        _stream(spark, src), seen, out, ckpt, robots=robots,
        per_host_limit=5,
    )
    q3.awaitTermination(120)
    assert sorted(
        r.host for r in spark.read.parquet(out).collect()
    ) == hosts
    # the seen store knows every crawled + queued canonical form
    seen_keys = {
        r.canonical_url for r in spark.read.parquet(seen).collect()
    }
    assert "https://hub.example" in seen_keys       # crawled (root -> '')
    assert "https://a.example/page" in seen_keys    # crawled + queued
    assert "https://c.example/new" in seen_keys     # queued
