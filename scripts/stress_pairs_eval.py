#!/usr/bin/env python
"""Scale stress for the round-11 acquisition/eval operators:
image-text pair mining (pairs.py — pure-Catalyst tag mining + the
pair-dedup aggregate), subtitle parsing + clip alignment
(subtitles.py — narrow Arrow parse + media-id equi-join), and
retrieval evaluation (evalmetrics.py — one run-side rank window +
broadcast qrels joins), each at 1x and 10x. vs_10x ratio ≤ ~1 means
the plan scales at worst linearly on a fixed-parallelism box.

All inputs synthesize IN SPARK (codegen'd concat over a range — the
driver never materializes the corpora), so the measured work is the
operator, not a createDataFrame upload.

Usage: python scripts/stress_pairs_eval.py
Output: one JSON line; paste the numbers into BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from vectra_py_spark.session import get_spark  # noqa: E402

N_PAGES_1X = 20_000  # ~14 img tags each
N_SUBS_1X = 10_000  # 20 cues each
N_RUNS_1X = 400_000  # run rows (2k queries x 200 candidates)


def timed(fn):
    t0 = time.monotonic()
    n = fn()
    return round(time.monotonic() - t0, 3), n


def synth_pages(spark, n: int):
    d = F.col("id")
    s = d.cast("string")
    one = F.concat(
        F.lit('<img src="i'), s, F.lit('.png" alt="caption '), s,
        F.lit(' alpha beta gamma delta">'),
        F.lit("<img src='//cdn.example/c"), s,
        F.lit(".jpg' alt='second caption for "), s, F.lit("'>"),
        F.lit('<img src="/r/'), s, F.lit('.gif" alt="IMG_1.jpg">'),
        F.lit('<img src="x.png" alt="no">'),
        F.lit('<p>filler text between the image blocks</p>'),
    )
    seven = F.concat(one, one, one, one, one, one, one)  # 28 tags
    return spark.range(n).select(
        F.concat(
            F.lit("https://h"), (d % 997).cast("string"),
            F.lit(".example/d"), (d % 13).cast("string"),
            F.lit("/p"), s, F.lit(".html"),
        ).alias("url"),
        F.concat(F.lit("<html><body>"), seven, F.lit("</body></html>"))
        .alias("text"),
    )


def synth_subs(spark, n: int, cues: int = 20):
    d = F.col("id")
    s = d.cast("string")

    def ts(ms: F.Column) -> F.Column:
        return F.format_string(
            "00:%02d:%02d,%03d",
            (ms / 60000).cast("int"),
            ((ms / 1000) % 60).cast("int"),
            (ms % 1000).cast("int"),
        )

    blocks = []
    for i in range(cues):
        start = (d % 5) * 100 + 1100 * i
        blocks.append(
            F.concat(
                F.lit(f"{i + 1}\n"), ts(start), F.lit(" --> "),
                ts(start + 900), F.lit("\nnarration "), s,
                F.lit(f" segment {i}\n\n"),
            )
        )
    return spark.range(n).select(
        F.concat(F.lit("s"), s).alias("media_id"),
        F.concat(*blocks).alias("text"),
    )


def run_scale(spark, scale: int) -> dict:
    from vectra_py_spark.operators.evalmetrics import (
        retrieval_metrics, retrieval_summary,
    )
    from vectra_py_spark.operators.pairs import (
        dedup_image_text_pairs, image_text_pairs_df,
    )
    from vectra_py_spark.operators.subtitles import (
        align_cues_to_frames, subtitle_cues_df,
    )

    out: dict = {"scale": scale}

    pages = synth_pages(spark, N_PAGES_1X * scale)
    out["pairs_s"], out["pairs_n"] = timed(
        lambda: image_text_pairs_df(pages).count()
    )
    out["pairs_dedup_s"], out["pairs_dedup_n"] = timed(
        lambda: dedup_image_text_pairs(image_text_pairs_df(pages)).count()
    )

    subs = synth_subs(spark, N_SUBS_1X * scale)
    frames = spark.range(N_SUBS_1X * scale).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("media_id"),
        F.explode(F.sequence(F.lit(0), F.lit(47))).alias("frame_idx"),
    )
    cues = subtitle_cues_df(subs)
    out["subs_s"], out["subs_n"] = timed(lambda: cues.count())
    out["align_s"], out["align_n"] = timed(
        lambda: align_cues_to_frames(cues, frames, fps=2.0).count()
    )

    n_q = 2_000 * scale
    d = F.col("id")
    runs = spark.range(N_RUNS_1X * scale).select(
        (d % n_q).cast("string").alias("query_id"),
        F.format_string("d%08d", d).alias("doc_id"),
        ((d * 37) % 1009).cast("double").alias("score"),
    )
    qrels = spark.range(N_RUNS_1X * scale // 20).select(
        ((d * 20) % n_q).cast("string").alias("query_id"),
        F.format_string("d%08d", d * 20).alias("doc_id"),
        (d % 3).alias("rel"),
    )
    per_q = retrieval_metrics(runs, qrels, k=10)
    out["eval_s"], out["eval_n"] = timed(lambda: per_q.count())
    out["eval_summary_s"], _ = timed(
        lambda: retrieval_summary(per_q).collect() and 1
    )

    from vectra_py_spark.operators.webdataset import to_webdataset_shards

    samples = spark.range(40_000 * scale).select(
        F.format_string("s%08d", d).alias("key"),
        F.encode(F.repeat(F.lit("x"), (d % 200 + 40).cast("int")), "utf-8")
        .alias("image"),
        F.concat(F.lit("caption for sample "), d.cast("string"))
        .alias("caption"),
    )
    wds = to_webdataset_shards(
        samples, {"jpg": "image", "txt": "caption"},
        n_shards=64 * scale,
    )
    out["wds_s"], out["wds_n"] = timed(lambda: wds.count())
    return out


def main() -> None:
    spark = get_spark(app_name="stress-pairs-eval")
    run_scale(spark, 1)  # warmup, discarded
    r1 = run_scale(spark, 1)
    r10 = run_scale(spark, 10)
    ratios = {
        k: round(r10[k] / (10.0 * max(r1[k], 1e-9)), 2)
        for k in r1 if k.endswith("_s")
    }
    print(json.dumps({
        "metric": "pairs_eval_stress",
        "r1x": r1, "r10x": r10, "vs_10x": ratios,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
