#!/usr/bin/env python
"""Quantify probe-before-decode (`operators/probe.py::triage_media`)
on a crawl-shaped media corpus: how many payload BYTES never reach a
decoder, and what that does to wall clock, when a header-only triage
stage runs first (VERDICT r7 item 5).

Corpus shape (deliberately crawl-like, sized off sf0.1's documents
table): ~60% small decodable images/audio, ~20% corrupt payloads,
~20% oversized video containers (the expensive decodes a policy
bounds out). Pipeline A decodes everything under quarantine; pipeline
B runs triage_media(kinds=images+audio, max_bytes=…) first and decodes
only survivors.

Usage: python scripts/bench_triage.py [n_payloads]
Appends nothing; prints one JSON line for BENCH.md transcription.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from vectra_py_spark.operators import multimodal as mm  # noqa: E402
from vectra_py_spark.operators.avi import synth_avi  # noqa: E402
from vectra_py_spark.operators.mp4 import synth_mp4  # noqa: E402
from vectra_py_spark.operators.probe import triage_media  # noqa: E402
from vectra_py_spark.session import get_spark  # noqa: E402

KINDS_POLICY = {"jpeg", "png", "gif", "bmp", "ppm", "wav", "flac"}
MAX_BYTES = 60_000


def synth_corpus(n: int) -> list[tuple[str, bytes]]:
    rng = np.random.default_rng(8)
    out = []
    img = mm.decode_ppm(mm.synth_ppm(48, 32))
    small = [
        mm.encode_jpeg(img, quality=85),
        mm.encode_png(img),
        mm.synth_gif(3, 48, 32),
        mm.synth_wav(seconds=0.2),
        mm.encode_bmp(img),
    ]
    big_video = [synth_avi(24, 160, 120), synth_mp4(24, 160, 120)]
    for i in range(n):
        r = rng.random()
        if r < 0.6:
            p = small[i % len(small)]
        elif r < 0.8:
            p = bytes(rng.integers(0, 256, size=512, dtype=np.uint8))
        else:
            p = big_video[i % 2]
        out.append((f"m{i}", p))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("bench-triage")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth_corpus(n)
    total_bytes = sum(len(p) for _, p in corpus)
    rows = [(mid, "media", bytearray(p), {}) for mid, p in corpus]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).persist()
    df.count()

    # A: decode everything (quarantine) — every byte reaches a decoder
    t0 = time.perf_counter()
    mm.extract_features(df, decoder="auto", on_error="quarantine").count()
    wall_all = time.perf_counter() - t0

    # B: triage first, decode survivors only
    t0 = time.perf_counter()
    kept = triage_media(df, kinds=KINDS_POLICY, max_bytes=MAX_BYTES)
    kept_bytes = kept.agg(F.sum("n_bytes")).collect()[0][0] or 0
    mm.extract_features(
        kept.drop("kind", "n_bytes"), decoder="auto", on_error="fail"
    ).count()
    wall_triaged = time.perf_counter() - t0

    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    print(json.dumps({
        "n_payloads": n,
        "total_mb": round(total_bytes / 1e6, 1),
        "decoded_mb_no_triage": round(total_bytes / 1e6, 1),
        "decoded_mb_triaged": round(kept_bytes / 1e6, 1),
        "bytes_saved_pct": round(100 * (1 - kept_bytes / total_bytes), 1),
        "wall_s_no_triage": round(wall_all, 2),
        "wall_s_triaged": round(wall_triaged, 2),
        "wall_saved_pct": round(100 * (1 - wall_triaged / wall_all), 1),
        "load_avg": load,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
