"""Video copy detection (`operators/videohash.py`): per-frame pHash +
temporal offset alignment. Planted trim/re-encode copies must match at
the exact frame offset; novel clips must not; the materialized index
prunes partitions and validates its write radius."""

from __future__ import annotations

import numpy as np
import pytest

from vectra_py_spark.operators.avi import encode_avi_mjpeg
from vectra_py_spark.operators.jpeg import encode_jpeg
from vectra_py_spark.operators.videohash import (
    video_frame_hashes,
    video_match_pairs,
    video_phash_df,
    video_probe,
    video_write_index,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

W, H = 32, 32
N_FRAMES = 10


def _frame(base: int, i: int) -> np.ndarray:
    """Per-(clip-base, frame) blob image — frames differ within a clip
    (so offsets are unambiguous), bases differ strongly across clips."""
    yy, xx = np.mgrid[0:H, 0:W]
    rng = np.random.default_rng(1000 * (base + 1) + i)
    img = np.zeros((H, W))
    for _ in range(4):
        cy, cx = rng.uniform(0, H), rng.uniform(0, W)
        amp, sig = rng.uniform(60, 140), rng.uniform(3, 8)
        img += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
    return np.clip(img, 0, 255).astype(np.uint8)


def _clip(base: int, trim: int = 0, quality: int = 85) -> bytes:
    jpegs = [
        encode_jpeg(_frame(base, i), quality=quality)
        for i in range(trim, N_FRAMES)
    ]
    return encode_avi_mjpeg(jpegs, W, H)


def test_frame_hashes_deterministic_and_stride():
    clip = _clip(0)
    h1 = video_frame_hashes(clip)
    h2 = video_frame_hashes(clip)
    assert h1 == h2 and len(h1) == N_FRAMES
    assert [fi for fi, _ in h1] == list(range(N_FRAMES))
    h_s = video_frame_hashes(clip, stride=3)
    assert [fi for fi, _ in h_s] == [0, 3, 6, 9]
    assert all(fp == dict(h1)[fi] for fi, fp in h_s)
    with pytest.raises(ValueError):
        video_frame_hashes(clip, stride=0)
    with pytest.raises(ValueError):
        video_frame_hashes(b"not a video")


def test_gif_container_hashes():
    from vectra_py_spark.operators.multimodal import synth_gif

    gif = synth_gif(n_frames=4, width=24, height=16)
    hashes = video_frame_hashes(gif)
    assert [fi for fi, _ in hashes] == [0, 1, 2, 3]


def test_match_pairs_trim_reencode_and_novel(spark):
    rows = []
    for b in range(3):
        rows.append((f"b{b}_orig", _clip(b)))
        rows.append((f"b{b}_trim", _clip(b, trim=3)))
        rows.append((f"b{b}_requal", _clip(b, quality=60)))
    rows.append(("novel_x", _clip(50)))
    rows.append(("novel_y", _clip(60)))
    rows.append(("junk", b"Z" * 500))
    df = spark.createDataFrame(rows, ["media_id", "data"])
    fh = video_phash_df(df)
    # quarantine: the junk payload is ONE error row, nothing crashed
    errs = [r.media_id for r in fh.filter("error IS NOT NULL").collect()]
    assert errs == ["junk"]

    pairs = video_match_pairs(fh, radius=7, min_aligned=3).collect()
    got = {(p.id_a, p.id_b): (p.offset, p.n_aligned) for p in pairs}
    # all pairs within one base; every planted copy pairs with its orig
    for (a, b2) in got:
        assert a.split("_")[0] == b2.split("_")[0]
    for b in range(3):
        # trim of 3 frames: orig frame j+3 == trim frame j → offset +3
        off, n = got[(f"b{b}_orig", f"b{b}_trim")]
        assert off == 3 and n >= N_FRAMES - 3 - 1
        # re-encode: same frame indices → offset 0
        off, n = got[(f"b{b}_orig", f"b{b}_requal")]
        assert off == 0 and n >= N_FRAMES - 1
    assert not any("novel" in a or "novel" in b2 for a, b2 in got)


def test_match_pairs_distinct_hashes_option(spark):
    # a static-scene clip: every frame identical → repeated hashes;
    # distinct_hashes_only keeps one per clip, and copies still match
    static = encode_avi_mjpeg(
        [encode_jpeg(_frame(9, 0), quality=85)] * 8, W, H
    )
    df = spark.createDataFrame(
        [("s_a", static), ("s_b", static)], ["media_id", "data"]
    )
    fh = video_phash_df(df)
    full = video_match_pairs(fh, min_aligned=3).collect()
    assert len(full) == 1 and full[0].n_aligned == 8  # diagonal offset 0
    thin = video_match_pairs(
        fh, min_aligned=1, distinct_hashes_only=True
    ).collect()
    assert len(thin) == 1 and thin[0].n_aligned == 1


def test_video_index_probe_prunes_validates_and_matches(spark, tmp_path):
    import re

    rows = [(f"clip{b}", _clip(b)) for b in range(4)]
    df = spark.createDataFrame(rows, ["media_id", "data"])
    path = str(tmp_path / "vidx")
    video_write_index(video_phash_df(df), path, radius=7)

    # a trimmed copy of clip2 probes back to it at the exact offset
    probe = video_probe(spark, path, _clip(2, trim=4), min_aligned=3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
    assert m and "block_idx" in m.group(1)
    got = probe.collect()
    assert [r.media_id for r in got] == ["clip2"]
    assert got[0].offset == 4
    assert got[0].n_aligned_est == got[0].n_aligned * got[0].stride

    # novel clip → empty; probe radius above the write radius → raises
    assert video_probe(spark, path, _clip(77), min_aligned=3).collect() == []
    with pytest.raises(ValueError, match="write radius"):
        video_probe(spark, path, _clip(2), radius=15, min_aligned=3)
    # a TIGHTER probe radius stays valid: partition predicates follow
    # the index's block geometry, the probe radius only gates Hamming
    tight = video_probe(
        spark, path, _clip(2, trim=4), radius=3, min_aligned=3
    ).collect()
    assert [r.media_id for r in tight] == ["clip2"]

    # long-clip subsampling: cap the probe frames and the full-unit
    # threshold still holds via the internal stride scaling
    probe2 = video_probe(
        spark, path, _clip(2), min_aligned=6, max_probe_frames=4
    )
    got2 = probe2.collect()
    assert [r.media_id for r in got2] == ["clip2"]
    assert got2[0].stride >= 2
