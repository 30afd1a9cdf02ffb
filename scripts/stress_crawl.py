#!/usr/bin/env python
"""Scale stress for the crawl acquisition layer (round 9): times
host-graph construction, PageRank, full-URL outlink extraction,
boilerplate removal, and the frontier composition at 1x and 10x page
counts in one session and reports the scaling ratio. A scale-correct
operator is near-linear in pages (extraction) or in edges (graph ops);
PageRank iterations are fixed-count, so its cost tracks the edge list,
which the host-graph aggregate keeps orders of magnitude smaller than
the page corpus.

Usage: python scripts/stress_crawl.py
Output: one JSON line; paste the numbers into BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from vectra_py_spark.operators.boilerplate import main_content_df  # noqa: E402
from vectra_py_spark.operators.linkgraph import (  # noqa: E402
    crawl_frontier,
    host_graph,
    host_pagerank,
    outlinks_df,
)
from vectra_py_spark.session import get_spark  # noqa: E402

N_PAGES_1X = 2_000
N_HOSTS_1X = 120
LINKS_PER_PAGE = 12

PROSE = (
    "It was the considered view of the committee that the proposal "
    "should be adopted in full and that the budget which came with it "
    "ought to be approved by all of the members who were present. "
)


def synth_pages(spark, n_pages: int, n_hosts: int, seed: int = 7,
                tag: str = "p"):
    """Deterministic synthetic web: pages across n_hosts with a
    Zipf-ish link distribution (low host ids attract more links) and
    realistic chrome around the prose. ``tag`` distinguishes page URLs
    across crawl waves while the outlink TARGETS stay in the shared
    ``p``-space, so later waves re-propose mostly-seen candidates —
    the anti-join shape the streaming frontier exists for."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_pages):
        h = i % n_hosts
        url = f"https://h{h}.example/{tag}{i}"
        targets = rng.zipf(1.6, LINKS_PER_PAGE) % n_hosts
        links = "".join(
            f'<a href="https://h{t}.example/p{rng.integers(n_pages)}">x</a>'
            for t in targets
        )
        nav = (
            '<nav><a href="/">Home</a><a href="/a">About</a>'
            '<a href="/c">Contact</a></nav>'
        )
        paras = "".join(
            f"<p>{PROSE}page {i} para {j}</p>" for j in range(4)
        )
        rows.append((url, f"<html><body>{nav}{paras}<div>{links}</div>"
                          f"<footer>Copyright</footer></body></html>"))
    return spark.createDataFrame(rows, ["url", "text"])


def timed(fn):
    t0 = time.monotonic()
    n = fn()
    return round(time.monotonic() - t0, 3), n


def run_scale(spark, n_pages: int, n_hosts: int) -> dict:
    pages = synth_pages(spark, n_pages, n_hosts).cache()
    pages.count()
    crawled = pages.select("url").sample(0.5, seed=1).cache()
    crawled.count()
    out = {}
    out["outlinks_s"], out["outlinks_rows"] = timed(
        lambda: outlinks_df(pages).count()
    )
    edges = host_graph(pages).cache()
    out["host_graph_s"], out["edges"] = timed(edges.count)
    out["pagerank_s"], out["hosts"] = timed(
        lambda: host_pagerank(edges, iterations=10).count()
    )
    out["boilerplate_s"], _ = timed(
        lambda: main_content_df(pages).agg(
            {"n_blocks_kept": "sum"}
        ).collect()[0][0]
    )
    out["frontier_s"], out["frontier_rows"] = timed(
        lambda: crawl_frontier(
            pages, crawled, per_host_limit=50
        ).count()
    )
    # classifier training: label = host parity (structurally separable
    # via the per-host link targets), 8 GD iterations over hashed
    # features — cost is iterations x (two corpus-keyed aggregates)
    from pyspark.sql import functions as F

    from vectra_py_spark.operators.textclf import (
        hashed_features, train_logreg,
    )

    labeled = pages.select(
        F.col("url").alias("doc_id"), "text",
        (F.crc32(F.col("url")) % 2).cast("int").alias("y"),
    ).cache()
    labeled.count()
    feats = hashed_features(labeled, id_col="doc_id", n_features=1 << 16)
    out["train_logreg_s"], _ = timed(
        lambda: train_logreg(
            feats, labeled.select("doc_id", "y"), iterations=8
        ).count()
    )
    labeled.unpersist()
    pages.unpersist()
    crawled.unpersist()
    edges.unpersist()
    return out


def run_stream_frontier(spark, n_pages: int, n_hosts: int) -> dict:
    """VERDICT r9 item 5: the continuous acquisition loop at stress
    scale — 3 waves of pages through `streaming/frontier.py`, each
    wave anti-joining a persistent seen store that the previous waves
    grew. Outlink targets share one URL space across waves, so wave
    2+ candidates are mostly already-seen: the measured wall is
    dominated by exactly the store-sized anti-join the batch twin's
    1.52 ratio measures."""
    import os
    import tempfile

    from vectra_py_spark.streaming.frontier import stream_frontier

    base = tempfile.mkdtemp()
    src = os.path.join(base, "pages")
    seen = os.path.join(base, "seen")
    out_p = os.path.join(base, "frontier")
    ckpt = os.path.join(base, "ckpt")
    res = {}
    for wave in range(3):
        pages = synth_pages(
            spark, n_pages, n_hosts, seed=7 + wave, tag=f"w{wave}_",
        )
        pages.write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("url STRING, text STRING")
            .option("maxFilesPerTrigger", 10_000)
            .parquet(src)
        )

        def _run():
            q = stream_frontier(
                stream, seen, out_p, ckpt, per_host_limit=50,
            )
            q.awaitTermination(600)
            return spark.read.parquet(out_p).count()

        res[f"wave{wave + 1}_s"], res[f"wave{wave + 1}_frontier_rows"] = (
            timed(_run)
        )
    res["seen_store_rows"] = spark.read.parquet(seen).count()
    return res


def run_cdx_selective(spark, n_caps: int, pdf_every: int = 50) -> dict:
    """VERDICT r9 item 3 (bench side): indexed range reads vs the
    full scan, reproducibly, at stress scale — a .warc.gz of
    ``n_caps`` captures with a 2% PDF fraction; select the PDFs via
    `cdx_select` and fetch ONLY those members. Bytes touched must
    track the selected fraction (corpus-size-independent), wall must
    beat the full scan by roughly the inverse selectivity."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from vectra_py_spark.sources.cdx import (
        cdx_select, fetch_cdx_records, index_warc, read_cdx,
    )
    from vectra_py_spark.sources.warc import read_warc, synth_warc

    base = tempfile.mkdtemp()
    seg_dir = os.path.join(base, "segs")
    idx_dir = os.path.join(base, "idx")
    os.makedirs(seg_dir)
    os.makedirs(idx_dir)
    pages = []
    for i in range(n_caps):
        if i % pdf_every == 0:
            body = f"%PDF-1.4 synthetic body {i} ".encode() + b"x" * 160
            ct = "application/pdf"
        else:
            body = (
                f"<html><body><p>page {i}</p>"
                + "word " * 40 + "</body></html>"
            ).encode()
            ct = "text/html"
        pages.append((f"https://h{i % 97}.example/p{i}", body, ct))
    payload = synth_warc(pages, compress=True)
    seg = os.path.join(seg_dir, "seg.warc.gz")
    with open(seg, "wb") as fh:
        fh.write(payload)
    with open(os.path.join(idx_dir, "index.cdxj"), "w") as fh:
        for ln in index_warc(payload, seg):
            fh.write(ln + "\n")

    out = {"captures": n_caps, "archive_bytes": len(payload)}
    out["full_scan_s"], out["full_scan_pdfs"] = timed(
        lambda: read_warc(spark, seg_dir)
        .filter("content_type LIKE 'application/pdf%'")
        .count()
    )
    sel = cdx_select(
        read_cdx(spark, idx_dir), mime="application/pdf"
    ).cache()
    out["selected"] = sel.count()
    out["selected_bytes"] = sel.agg(F.sum("length")).collect()[0][0]
    out["indexed_s"], out["indexed_pdfs"] = timed(
        lambda: fetch_cdx_records(spark, sel).count()
    )
    sel.unpersist()
    out["bytes_frac"] = round(out["selected_bytes"] / len(payload), 4)
    out["speedup"] = round(
        out["full_scan_s"] / max(out["indexed_s"], 1e-9), 1
    )
    return out


def main() -> None:
    spark = get_spark(app_name="stress-crawl")
    run_scale(spark, 200, 20)  # JVM/codegen warmup, discarded
    r1 = run_scale(spark, N_PAGES_1X, N_HOSTS_1X)
    r10 = run_scale(spark, N_PAGES_1X * 10, N_HOSTS_1X * 10)
    ratios = {
        k: round(r10[k] / max(r1[k], 1e-9), 2)
        for k in r1
        if k.endswith("_s")
    }
    sf1 = run_stream_frontier(spark, N_PAGES_1X, N_HOSTS_1X)
    sf10 = run_stream_frontier(spark, N_PAGES_1X * 10, N_HOSTS_1X * 10)
    sf_ratios = {
        k: round(sf10[k] / max(sf1[k], 1e-9), 2)
        for k in sf1
        if k.endswith("_s")
    }
    cdx1 = run_cdx_selective(spark, 2_000)
    cdx10 = run_cdx_selective(spark, 20_000)
    print(json.dumps({
        "metric": "crawl_layer_stress",
        "pages_1x": N_PAGES_1X,
        "r1x": r1,
        "r10x": r10,
        "vs_10x_time_ratio": ratios,
        "stream_frontier_1x": sf1,
        "stream_frontier_10x": sf10,
        "stream_frontier_10x_ratio": sf_ratios,
        "cdx_selective_1x": cdx1,
        "cdx_selective_10x": cdx10,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
