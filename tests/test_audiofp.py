"""Constellation audio fingerprinting (`operators/audiofp.py`):
determinism, trim-offset recovery, amplitude invariance,
discrimination between different recordings, quarantine, and the
Spark match join."""

from __future__ import annotations

import numpy as np
import pytest

from vectra_py_spark.operators.audio import encode_audio_payload
from vectra_py_spark.operators.audiofp import (
    audio_fingerprint_df,
    audio_match_pairs,
    constellation,
    fingerprints,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

SR = 8000
HOP = 512


def _melody(seed: int, seconds: float = 2.0) -> np.ndarray:
    """Deterministic two-voice CHIRP melody: 8 segments, each two
    linear frequency sweeps. Constant pure tones are degenerate for
    constellation hashing (identical frames repeat, and coarse bins
    coincide across clips — measured up to 16 aligned collisions);
    chirps give time-varying landmarks, dropping cross-clip alignment
    to ≤9 while true copies align at 350-700."""
    rng = np.random.default_rng(seed)
    segs = []
    n = int(seconds * SR) // 8
    for _ in range(8):
        f0, f1 = rng.uniform(200, 3200, size=2)
        g0, g1 = rng.uniform(200, 3200, size=2)
        t = np.arange(n) / SR
        ph1 = 2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * t[-1]))
        ph2 = 2 * np.pi * (g0 * t + (g1 - g0) * t**2 / (2 * t[-1]))
        segs.append(0.4 * np.sin(ph1) + 0.3 * np.sin(ph2))
    return np.concatenate(segs)


def _wav(x: np.ndarray) -> bytes:
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int64)[:, None]
    return encode_audio_payload(pcm, SR, "wav")


def test_fingerprints_deterministic_and_structured():
    x = _melody(1)
    fps = fingerprints(x, SR)
    assert fps == fingerprints(x.copy(), SR)
    assert len(fps) > 50
    marks = constellation(x, SR)
    assert len(marks) > 0
    assert (marks[:, 1] >= 0).all()


def test_amplitude_scaling_preserves_fingerprints():
    """Peak LOCATIONS are amplitude-invariant: a 0.5x copy shares
    nearly all hashes at offset 0."""
    x = _melody(2)
    a = set(fingerprints(x, SR))
    b = set(fingerprints(0.5 * x, SR))
    assert len(a & b) / len(a) > 0.9


def test_trim_offset_recovered(spark):
    """A copy with the first 16 hop-aligned frames cut must match its
    original with offset exactly −16 (anchor times shift down)."""
    x = _melody(3, seconds=3.0)
    cut = 16 * HOP
    rows = [("orig", _wav(x)), ("trimmed", _wav(x[cut:]))]
    df = spark.createDataFrame(rows, ["media_id", "data"])
    fp = audio_fingerprint_df(df)
    got = audio_match_pairs(fp, min_matches=50).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == ("orig", "trimmed")
    assert r.offset == 16  # t_orig - t_trimmed
    assert r.n_aligned >= 50


def test_different_recordings_do_not_match(spark):
    rows = [(f"clip{i}", _wav(_melody(100 + i))) for i in range(4)]
    df = spark.createDataFrame(rows, ["media_id", "data"])
    got = audio_match_pairs(
        audio_fingerprint_df(df), min_matches=20
    ).collect()
    assert got == []  # measured cross-clip alignment tops out at 9


def test_reencode_and_noise_still_match(spark):
    """Light additive noise keeps peak locations: the noisy copy
    aligns at offset 0 with a strong match count."""
    x = _melody(5)
    rng = np.random.default_rng(0)
    noisy = x + rng.normal(scale=0.01, size=x.shape)
    df = spark.createDataFrame(
        [("a", _wav(x)), ("b", _wav(noisy))], ["media_id", "data"]
    )
    got = audio_match_pairs(
        audio_fingerprint_df(df), min_matches=50
    ).collect()
    assert len(got) == 1 and got[0].offset == 0


def test_corrupt_payload_quarantines(spark):
    df = spark.createDataFrame(
        [("ok", _wav(_melody(6))), ("bad", b"RIFFnope")],
        ["media_id", "data"],
    )
    fp = audio_fingerprint_df(df)
    errs = {r.media_id for r in fp.filter("error IS NOT NULL").collect()}
    assert errs == {"bad"}
    assert fp.filter("media_id = 'ok' AND error IS NULL").count() > 50


def test_audio_index_probe_prunes_and_matches(spark, tmp_path):
    """Materialized index: a trimmed copy probes to its source by
    opening only its hash buckets (PartitionFilters in the plan);
    a novel melody probes empty."""
    import re

    from vectra_py_spark.operators.audiofp import (
        audio_fingerprint_df,
        audio_probe,
        audio_write_index,
    )

    rows = [(f"clip{i}", _wav(_melody(400 + i, seconds=3.0)))
            for i in range(4)]
    df = spark.createDataFrame(rows, ["media_id", "data"])
    path = str(tmp_path / "afpidx")
    audio_write_index(audio_fingerprint_df(df), path)

    x = _melody(402, seconds=3.0)  # == clip2's source
    # default probe subsampling (256 of ~1100 hashes) keeps the
    # partition pruning real for multi-second clips. min_matches is in
    # FULL units (audio_match_pairs-comparable, ADVICE r10): a true
    # copy aligns at ~700 full-unit hits, so a 300 threshold holds
    # regardless of how aggressively the probe subsamples
    probe = audio_probe(spark, path, _wav(x[8 * HOP:]), min_matches=300)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
    assert m and "bucket" in m.group(1)
    got = probe.collect()
    assert [r.media_id for r in got] == ["clip2"]
    assert got[0].offset == 8
    # the sampling accounting: stride > 1 here (the clip emits > 256
    # hashes), and the extrapolated count is exactly n_aligned * stride
    assert got[0].stride > 1
    assert got[0].n_aligned_est == got[0].n_aligned * got[0].stride
    assert got[0].n_aligned_est >= 300  # full-unit threshold satisfied

    # chance alignment grows with clip length (3 s ≈ 46 frames
    # measured up to ~22 aligned collisions vs ~700 for true copies) —
    # the same full-unit threshold rejects a novel melody even after
    # the internal max(1, min_matches // stride) scaling
    novel = audio_probe(
        spark, path, _wav(_melody(999, seconds=3.0)), min_matches=300
    )
    assert novel.collect() == []

    # the subsample bounds the buckets opened (the pruning claim)
    from pyspark.sql import functions as F

    from vectra_py_spark.operators.audiofp import fingerprints as _fps
    from vectra_py_spark.operators.audio import decode_audio_payload

    smp, sr, _k = decode_audio_payload(_wav(x[8 * HOP:]))
    n_full = len(_fps(smp.astype("float64").mean(axis=1) / 32768.0, sr))
    assert n_full > 256  # the saturation case is what we are testing
