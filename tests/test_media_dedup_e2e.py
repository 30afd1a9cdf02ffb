"""Corpus-level media-dedup e2e (VERDICT r10 item 4; video lane added
per VERDICT r11 item 5): one pipeline run over a mixed 10×-scale
folder — probe-triage → perceptual image near-dup → audio copy
detection → video copy detection → quarantine — asserting the
BYTES-TOUCHED bound the same way the crawl e2e does for CDX selective
reads: the triage stage is the only stage that reads every payload;
each decoder lane receives EXACTLY its own modality's bytes, and junk
reaches no decoder at all.

Scale shape under test (the 100 TB story): the only corpus-sized work
is two narrow mapInPandas passes (triage, then hash/fingerprint per
lane); everything after runs on hash tables orders of magnitude
smaller than the payloads. Payload bytes never shuffle.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # excluded from the smoke tier

SR = 8000

# 10× the unit-test corpora: 40 images in 10 planted clusters + junk +
# audio with planted trimmed copies + AVI-MJPEG videos with planted
# trim/re-encode copies — ~120 files total.
N_IMG_BASES = 10
N_IMAGES = 40          # 10 bases × 4 members (3 noisy copies each)
N_CLIP_BASES = 5
N_CLIPS = 20           # 5 bases × 4 members (3 hop-aligned trims each)
N_VID_BASES = 4
N_VIDEOS = 12          # 4 bases × 3 members (orig + trim + re-encode)
N_VID_FRAMES = 10
N_JUNK = 40


def _images():
    yy, xx = np.mgrid[0:32, 0:32]
    rows = []
    for i in range(N_IMAGES):
        b = i % N_IMG_BASES
        rng = np.random.default_rng(90_000 + b)
        img = np.zeros((32, 32))
        for _ in range(4):
            cy, cx = rng.uniform(0, 32), rng.uniform(0, 32)
            amp, sig = rng.uniform(60, 140), rng.uniform(3, 8)
            img += amp * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2)
            )
        if i >= N_IMG_BASES:  # noisy copy of its base
            noise = np.random.default_rng(91_000 + i)
            img = img + noise.integers(-1, 2, size=img.shape)
        g = np.clip(img, 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=2)
        rows.append((f"img{i:04d}", b"P6\n32 32\n255\n" + rgb.tobytes()))
    return rows


def _clips():
    from vectra_py_spark.operators.audio import encode_audio_payload

    rows = []
    for i in range(N_CLIPS):
        b = i % N_CLIP_BASES
        rng = np.random.default_rng(95_000 + b)
        segs = []
        seg_n = 2 * SR // 8
        for _ in range(8):
            f0, f1 = rng.uniform(200, 3200, size=2)
            t = np.arange(seg_n) / SR
            ph = 2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * t[-1]))
            segs.append(0.5 * np.sin(ph))
        x = np.concatenate(segs)
        if i >= N_CLIP_BASES:
            x = x[((i % 7) + 1) * 512:]  # hop-aligned trim
        pcm = (np.clip(x, -1, 1) * 32767).astype(np.int64)[:, None]
        rows.append((f"clip{i:04d}", encode_audio_payload(pcm, SR, "wav")))
    return rows


def _videos():
    """AVI-MJPEG clips: per base, an original, a 3-frame head trim
    (offset alignment must report +3), and a quality-60 re-encode
    (offset 0) — the copy shapes a single first-frame pHash misses."""
    from vectra_py_spark.operators.avi import encode_avi_mjpeg
    from vectra_py_spark.operators.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:32, 0:32]

    def frame(base, i):
        rng = np.random.default_rng(70_000 + 1000 * base + i)
        img = np.zeros((32, 32))
        for _ in range(4):
            cy, cx = rng.uniform(0, 32), rng.uniform(0, 32)
            amp, sig = rng.uniform(60, 140), rng.uniform(3, 8)
            img += amp * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2)
            )
        return np.clip(img, 0, 255).astype(np.uint8)

    def clip(base, trim=0, quality=85):
        jpegs = [
            encode_jpeg(frame(base, i), quality=quality)
            for i in range(trim, N_VID_FRAMES)
        ]
        return encode_avi_mjpeg(jpegs, 32, 32)

    rows = []
    for b in range(N_VID_BASES):
        rows.append((f"vid{b:02d}_orig", clip(b)))
        rows.append((f"vid{b:02d}_trim", clip(b, trim=3)))
        rows.append((f"vid{b:02d}_requal", clip(b, quality=60)))
    assert len(rows) == N_VIDEOS
    return rows


def _junk():
    rng = np.random.default_rng(99_000)
    # junk sized like real crawl debris (~8 KB each) so the fractional
    # bytes-touched bound below is meaningful, not vacuous
    return [
        (
            f"junk{i:04d}",
            bytes(rng.integers(0, 256, size=8192, dtype=np.uint8)),
        )
        for i in range(N_JUNK)
    ]


def test_media_dedup_corpus_e2e(spark):
    from vectra_py_spark.operators.audiofp import (
        audio_fingerprint_df,
        audio_match_pairs,
    )
    from vectra_py_spark.operators.imagehash import (
        media_phash_df,
        phash_neardup_pairs,
    )
    from vectra_py_spark.operators.probe import triage_media
    from vectra_py_spark.operators.videohash import (
        video_match_pairs,
        video_phash_df,
    )

    img_rows, clip_rows, junk_rows = _images(), _clips(), _junk()
    vid_rows = _videos()
    img_bytes = sum(len(p) for _, p in img_rows)
    clip_bytes = sum(len(p) for _, p in clip_rows)
    vid_bytes = sum(len(p) for _, p in vid_rows)
    junk_bytes = sum(len(p) for _, p in junk_rows)
    total_bytes = img_bytes + clip_bytes + vid_bytes + junk_bytes

    corpus = spark.createDataFrame(
        img_rows + clip_rows + vid_rows + junk_rows, ["media_id", "data"]
    ).selectExpr(
        "media_id", "'media' AS modality", "data",
        "CAST(map() AS MAP<STRING,STRING>) AS meta",
    ).persist()
    try:
        # 1) TRIAGE (the only corpus-wide payload read): one narrow
        #    mapInPandas splits the lanes from container headers alone.
        img_lane = triage_media(corpus, kinds={"ppm"}).persist()
        audio_lane = triage_media(corpus, kinds={"wav"}).persist()
        video_lane = triage_media(corpus, kinds={"avi"}).persist()
        try:
            img_seen = {
                r.media_id: r.n_bytes for r in img_lane.collect()
            }
            audio_seen = {
                r.media_id: r.n_bytes for r in audio_lane.collect()
            }
            video_seen = {
                r.media_id: r.n_bytes for r in video_lane.collect()
            }

            # BYTES-TOUCHED BOUND: each decoder lane receives exactly
            # its own modality's bytes — junk and cross-modality
            # payloads never reach a decoder (the crawl-e2e CDX
            # discipline applied to media dedup).
            assert set(img_seen) == {mid for mid, _ in img_rows}
            assert sum(img_seen.values()) == img_bytes
            assert set(audio_seen) == {mid for mid, _ in clip_rows}
            assert sum(audio_seen.values()) == clip_bytes
            assert set(video_seen) == {mid for mid, _ in vid_rows}
            assert sum(video_seen.values()) == vid_bytes
            decoded_bytes = (
                sum(img_seen.values())
                + sum(audio_seen.values())
                + sum(video_seen.values())
            )
            assert decoded_bytes < 0.9 * total_bytes  # junk quarantined
            assert decoded_bytes == img_bytes + clip_bytes + vid_bytes

            # 2) IMAGE NEAR-DUP: pHash + banded Hamming join. Every
            #    planted cluster collapses (4 members → C(4,2)=6 pairs,
            #    10 clusters → 60 pairs); no cross-cluster pair.
            hashes = media_phash_df(
                img_lane.select("media_id", "data")
            ).persist()
            try:
                assert hashes.filter("error IS NOT NULL").count() == 0
                pairs = phash_neardup_pairs(hashes, radius=7).collect()
            finally:
                hashes.unpersist()
            cluster_of = {
                mid: int(mid[3:]) % N_IMG_BASES for mid, _ in img_rows
            }
            # no false positives: every pair is within one planted
            # cluster; full recall for DEDUP purposes: every noisy copy
            # pairs with at least one other member of its cluster (a
            # few copy↔copy edges legitimately exceed the radius —
            # connected components still collapse each cluster)
            assert all(
                cluster_of[p.id_a] == cluster_of[p.id_b] for p in pairs
            )
            in_pairs = {x for p in pairs for x in (p.id_a, p.id_b)}
            img_copies = {
                mid for mid, _ in img_rows if int(mid[3:]) >= N_IMG_BASES
            }
            assert img_copies <= in_pairs
            assert len(pairs) >= len(img_copies)  # ≥ one edge per copy

            # 3) AUDIO COPY DETECTION: constellation fingerprints +
            #    offset-aligned match join on the trimmed copies.
            fps = audio_fingerprint_df(
                audio_lane.select("media_id", "data")
            ).persist()
            try:
                assert fps.filter("error IS NOT NULL").count() == 0
                matches = audio_match_pairs(fps, min_matches=40).collect()
            finally:
                fps.unpersist()
            base_of = {
                mid: int(mid[4:]) % N_CLIP_BASES for mid, _ in clip_rows
            }
            got_pairs = {(m.id_a, m.id_b) for m in matches}
            assert len(got_pairs) == len(matches)  # one best offset/pair
            assert all(base_of[a] == base_of[b] for a, b in got_pairs)
            # every planted copy matches something in its cluster
            matched = {x for p in got_pairs for x in p}
            copies = {m for m in base_of if int(m[4:]) >= N_CLIP_BASES}
            assert copies <= matched

            # 4) VIDEO COPY DETECTION: per-frame pHash + temporal
            #    offset alignment on the planted trim/re-encode copies
            #    (the copy shapes a single first-frame pHash misses).
            vh = video_phash_df(
                video_lane.select("media_id", "data")
            ).persist()
            try:
                assert vh.filter("error IS NOT NULL").count() == 0
                vpairs = video_match_pairs(
                    vh, radius=7, min_aligned=3
                ).collect()
            finally:
                vh.unpersist()
            vgot = {
                (p.id_a, p.id_b): (p.offset, p.n_aligned) for p in vpairs
            }
            assert len(vgot) == len(vpairs)  # one best offset per pair
            # no cross-base pair; every planted copy pairs with its orig
            # at the planted offset
            assert all(
                a.split("_")[0] == b.split("_")[0] for a, b in vgot
            )
            for b in range(N_VID_BASES):
                off, n = vgot[(f"vid{b:02d}_orig", f"vid{b:02d}_trim")]
                assert off == 3 and n >= N_VID_FRAMES - 3 - 1
                off, n = vgot[(f"vid{b:02d}_orig", f"vid{b:02d}_requal")]
                # quality-60 re-encode drifts a few frame hashes past
                # the radius — majority alignment at offset 0 is the
                # dedup criterion
                assert off == 0 and n >= N_VID_FRAMES // 2

            # 5) QUARANTINE accounting: triage dropped exactly the junk.
            kept = set(img_seen) | set(audio_seen) | set(video_seen)
            dropped = {
                r.media_id for r in corpus.select("media_id").collect()
            } - kept
            assert dropped == {mid for mid, _ in junk_rows}
        finally:
            img_lane.unpersist()
            audio_lane.unpersist()
            video_lane.unpersist()
    finally:
        corpus.unpersist()
