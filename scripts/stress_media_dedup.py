#!/usr/bin/env python
"""Scale stress for the round-10 multimodal dedup operators: the
perceptual image-hash pass + banded Hamming join (imagehash.py), the
audio fingerprint pass + offset-aligned match join (audiofp.py), and
margin-based bitext mining (similarity.py), each at 1x and 10x. The
hash/fingerprint passes are narrow per-payload work (ratio ≈ data
ratio / parallelism headroom); the joins run on hash tables orders of
magnitude smaller than the payloads, which is the scale story.

Usage: python scripts/stress_media_dedup.py
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

from vectra_py_spark.session import get_spark  # noqa: E402

N_IMAGES_1X = 400
N_CLIPS_1X = 120
N_VECS_1X = 400
SR = 8000


def synth_images(spark, n: int, n_bases: int):
    """PPM blobs: n_bases distinct images, the rest noisy copies —
    ~3 copies per base at every scale."""
    yy, xx = np.mgrid[0:32, 0:32]
    rows = []
    for i in range(n):
        b = i % n_bases
        rng = np.random.default_rng(50_000 + b)
        img = np.zeros((32, 32))
        for _ in range(4):
            cy, cx = rng.uniform(0, 32), rng.uniform(0, 32)
            amp, sig = rng.uniform(60, 140), rng.uniform(3, 8)
            img += amp * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2)
            )
        if i >= n_bases:
            noise = np.random.default_rng(60_000 + i)
            img = img + noise.integers(-1, 2, size=img.shape)
        g = np.clip(img, 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=2)
        rows.append((f"i{i:06d}", b"P6\n32 32\n255\n" + rgb.tobytes()))
    return spark.createDataFrame(rows, ["media_id", "data"])


def synth_clips(spark, n: int, n_bases: int):
    from vectra_py_spark.operators.audio import encode_audio_payload

    rows = []
    for i in range(n):
        b = i % n_bases
        rng = np.random.default_rng(70_000 + b)
        segs = []
        seg_n = 2 * SR // 8
        for _ in range(8):
            f0, f1 = rng.uniform(200, 3200, size=2)
            t = np.arange(seg_n) / SR
            ph = 2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * t[-1]))
            segs.append(0.5 * np.sin(ph))
        x = np.concatenate(segs)
        if i >= n_bases:
            x = x[((i % 7) + 1) * 512:]  # hop-aligned trims
        pcm = (np.clip(x, -1, 1) * 32767).astype(np.int64)[:, None]
        rows.append((f"a{i:06d}", encode_audio_payload(pcm, SR, "wav")))
    return spark.createDataFrame(rows, ["media_id", "data"])


N_VIDEOS_1X = 60
VID_FRAMES = 8


def synth_videos(spark, n: int, n_bases: int):
    """MJPEG AVIs: n_bases distinct clips, the rest hop trims (drop
    i%3+1 leading frames) — per-frame blob content so offsets are
    unambiguous."""
    from vectra_py_spark.operators.avi import encode_avi_mjpeg
    from vectra_py_spark.operators.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:32, 0:32]

    def frame(b, i):
        rng = np.random.default_rng(120_000 + 100 * b + i)
        img = np.zeros((32, 32))
        for _ in range(4):
            cy, cx = rng.uniform(0, 32), rng.uniform(0, 32)
            amp, sig = rng.uniform(60, 140), rng.uniform(3, 8)
            img += amp * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2)
            )
        return np.clip(img, 0, 255).astype(np.uint8)

    rows = []
    for i in range(n):
        b = i % n_bases
        trim = 0 if i < n_bases else (i % 3) + 1
        jpegs = [
            encode_jpeg(frame(b, j), quality=85)
            for j in range(trim, VID_FRAMES)
        ]
        rows.append((f"v{i:06d}", encode_avi_mjpeg(jpegs, 32, 32)))
    return spark.createDataFrame(rows, ["media_id", "data"])


def timed(fn):
    t0 = time.monotonic()
    n = fn()
    return round(time.monotonic() - t0, 3), n


def run_scale(spark, scale: int) -> dict:
    from vectra_py_spark.operators.audiofp import (
        audio_fingerprint_df, audio_match_pairs,
    )
    from vectra_py_spark.operators.imagehash import (
        media_phash_df, phash_neardup_pairs,
    )
    from vectra_py_spark.operators.similarity import margin_bitext_mine
    from vectra_py_spark.session import spread

    out = {}
    imgs = spread(synth_images(
        spark, N_IMAGES_1X * scale, max(1, N_IMAGES_1X * scale // 3)
    )).cache()
    imgs.count()
    hashes = media_phash_df(imgs).cache()
    out["image_hash_s"], out["images"] = timed(hashes.count)
    out["image_join_s"], out["image_pairs"] = timed(
        lambda: phash_neardup_pairs(hashes, radius=7).count()
    )
    hashes.unpersist()
    imgs.unpersist()

    clips = spread(synth_clips(
        spark, N_CLIPS_1X * scale, max(1, N_CLIPS_1X * scale // 2)
    )).cache()
    clips.count()
    fp = audio_fingerprint_df(clips).cache()
    out["audio_fp_s"], out["audio_fp_rows"] = timed(fp.count)
    out["audio_match_s"], out["audio_pairs"] = timed(
        lambda: audio_match_pairs(fp, min_matches=40).count()
    )
    fp.unpersist()
    clips.unpersist()

    from vectra_py_spark.operators.videohash import (
        video_match_pairs, video_phash_df,
    )

    vids = spread(synth_videos(
        spark, N_VIDEOS_1X * scale, max(1, N_VIDEOS_1X * scale // 3)
    )).cache()
    vids.count()
    vh = video_phash_df(vids).cache()
    out["video_hash_s"], out["video_hash_rows"] = timed(vh.count)
    out["video_join_s"], out["video_pairs"] = timed(
        lambda: video_match_pairs(vh, radius=7, min_aligned=3).count()
    )
    vh.unpersist()
    vids.unpersist()

    rng = np.random.default_rng(4)
    n = N_VECS_1X * scale
    src = spark.createDataFrame(
        [(i, rng.normal(size=32).tolist()) for i in range(n)],
        ["vec_id", "embedding"],
    )
    tgt = spark.createDataFrame(
        [(10_000_000 + i, rng.normal(size=32).tolist()) for i in range(n)],
        ["vec_id", "embedding"],
    )
    out["bitext_s"], out["bitext_pairs"] = timed(
        lambda: margin_bitext_mine(src, tgt, k=4, threshold=1.0).count()
    )

    # corpus-level e2e (VERDICT r10 item 4): mixed folder — images +
    # clips + junk through triage → phash pairs → audio pairs in one
    # composition, with the bytes-touched bound measured (each decoder
    # lane receives exactly its own modality's bytes; junk reaches no
    # decoder). Mirrors tests/test_media_dedup_e2e.py at stress scale.
    from pyspark.sql import functions as F

    from vectra_py_spark.operators.probe import triage_media

    n_junk = N_IMAGES_1X * scale // 2
    junk_rng = np.random.default_rng(80_000)
    junk = spark.createDataFrame(
        [
            (f"j{i:06d}",
             bytes(junk_rng.integers(0, 256, size=4096, dtype=np.uint8)))
            for i in range(n_junk)
        ],
        ["media_id", "data"],
    )
    mixed = spread(
        synth_images(
            spark, N_IMAGES_1X * scale, max(1, N_IMAGES_1X * scale // 3)
        )
        .unionByName(synth_clips(
            spark, N_CLIPS_1X * scale, max(1, N_CLIPS_1X * scale // 2)
        ))
        .unionByName(junk)
        .selectExpr(
            "media_id", "'media' AS modality", "data",
            "CAST(map() AS MAP<STRING,STRING>) AS meta",
        )
    ).cache()
    total_bytes = mixed.select(
        F.sum(F.length("data"))
    ).collect()[0][0]

    def _e2e():
        img_lane = triage_media(mixed, kinds={"ppm"}).cache()
        audio_lane = triage_media(mixed, kinds={"wav"}).cache()
        img_bytes = img_lane.select(F.sum("n_bytes")).collect()[0][0] or 0
        audio_bytes = (
            audio_lane.select(F.sum("n_bytes")).collect()[0][0] or 0
        )
        n_img_pairs = phash_neardup_pairs(
            media_phash_df(img_lane.select("media_id", "data")), radius=7
        ).count()
        n_audio_pairs = audio_match_pairs(
            audio_fingerprint_df(audio_lane.select("media_id", "data")),
            min_matches=40,
        ).count()
        img_lane.unpersist()
        audio_lane.unpersist()
        return img_bytes, audio_bytes, n_img_pairs, n_audio_pairs

    t0 = time.monotonic()
    img_bytes, audio_bytes, n_ip, n_ap = _e2e()
    out["e2e_s"] = round(time.monotonic() - t0, 3)
    out["e2e_total_bytes"] = int(total_bytes)
    out["e2e_decoded_bytes"] = int(img_bytes + audio_bytes)
    out["e2e_decoded_frac"] = round(
        (img_bytes + audio_bytes) / total_bytes, 4
    )
    out["e2e_img_pairs"], out["e2e_audio_pairs"] = n_ip, n_ap
    mixed.unpersist()
    return out


def main() -> None:
    spark = get_spark(app_name="stress-media-dedup")
    run_scale(spark, 1)  # warmup, discarded
    r1 = run_scale(spark, 1)
    r10 = run_scale(spark, 10)
    ratios = {
        k: round(r10[k] / max(r1[k], 1e-9), 2)
        for k in r1 if k.endswith("_s")
    }
    print(json.dumps({
        "metric": "media_dedup_stress",
        "r1x": r1, "r10x": r10, "vs_10x_time_ratio": ratios,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
