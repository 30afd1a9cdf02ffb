"""Continuous multimodal ingest: binaryFile readStream → the SAME
extract_features transformation as batch, exactly-once per micro-batch,
corrupt files quarantined in-stream. Equivalence-tested against the
batch operator on the identical files (the package's standard
streaming-twin discipline)."""

import os
import tempfile

import numpy as np
import pytest

from vectra_py_spark.operators import multimodal as mm
from vectra_py_spark.streaming.media import (
    media_file_stream,
    stream_media_features,
)


def _drop_files(d):
    from vectra_py_spark.operators.avi import synth_avi
    from vectra_py_spark.operators.flac import synth_flac
    from vectra_py_spark.operators.mp4 import synth_mp4

    img = mm.decode_ppm(mm.synth_ppm(24, 16))
    files = {
        "a.jpg": mm.encode_jpeg(img, quality=90),
        "b.png": mm.encode_png(img),
        "c.gif": mm.synth_gif(3, 24, 16),
        "d.wav": mm.synth_wav(),
        "e.bin": b"\x00\x01not-a-media-file",
        # r7 codecs ride the same sniff→decode map, zero stream changes
        "f.avi": synth_avi(4, 24, 16),
        "g.flac": synth_flac(),
        "h.mp4": synth_mp4(4, 24, 16),
    }
    for name, payload in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)
    return files


def test_stream_features_match_batch_and_quarantine(spark):
    drop = tempfile.mkdtemp()
    sink = tempfile.mkdtemp() + "/out"
    ckpt = tempfile.mkdtemp() + "/ckpt"
    files = _drop_files(drop)

    q = stream_media_features(
        media_file_stream(spark, drop), sink, ckpt,
        decoder="auto", on_error="quarantine",
    )
    q.awaitTermination(120)
    got = {
        os.path.basename(r.media_id): r
        for r in spark.read.parquet(sink).collect()
    }
    assert set(got) == set(files)
    # corrupt file quarantined in-stream, not a failed query
    assert "unrecognized media payload" in got["e.bin"].decode_error
    assert got["e.bin"].features == [0.0] * mm.FEATURE_DIM
    for name in ("a.jpg", "b.png", "c.gif", "d.wav", "f.avi", "g.flac", "h.mp4"):
        assert got[name].decode_error is None, name
        assert got[name].n_bytes == len(files[name])

    # equivalence: the batch operator on the same payloads produces the
    # identical features (same decode path, same schema)
    rows = [
        (name, "unknown", bytearray(payload), {})
        for name, payload in files.items()
    ]
    batch_df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    batch = {
        r.media_id: r.features
        for r in mm.extract_features(
            batch_df, decoder="auto", on_error="quarantine"
        ).collect()
    }
    for name in files:
        assert got[name].features == batch[name], name

    # incremental drain (exactly-once): re-running with a NEW file only
    # appends that file; completed batches are never re-decoded
    extra = mm.encode_bmp(mm.decode_ppm(mm.synth_ppm(8, 8)))
    with open(os.path.join(drop, "f.bmp"), "wb") as f:
        f.write(extra)
    q2 = stream_media_features(
        media_file_stream(spark, drop), sink, ckpt,
        decoder="auto", on_error="quarantine",
    )
    q2.awaitTermination(120)
    after = spark.read.parquet(sink)
    assert after.count() == len(files) + 1
    newrow = [
        r for r in after.collect() if os.path.basename(r.media_id) == "f.bmp"
    ]
    assert len(newrow) == 1 and newrow[0].decode_error is None


def test_stream_triage_before_decode(spark):
    """triage=... turns probe-before-decode on as the stream's first
    stage: corrupt and out-of-policy files never reach the decoder and
    produce NO sink row (vs the quarantine-row contract when triage is
    off). The crawl configuration (VERDICT r7 item 5)."""
    drop = tempfile.mkdtemp()
    sink = tempfile.mkdtemp() + "/out"
    ckpt = tempfile.mkdtemp() + "/ckpt"
    files = _drop_files(drop)

    q = stream_media_features(
        media_file_stream(spark, drop), sink, ckpt,
        decoder="auto", on_error="quarantine",
        # image+audio policy: video containers are out of scope here
        triage={"kinds": {"jpeg", "png", "gif", "bmp", "ppm", "wav",
                          "flac"}},
    )
    q.awaitTermination(120)
    got = {
        os.path.basename(r.media_id): r
        for r in spark.read.parquet(sink).collect()
    }
    # e.bin (probe-fails) and the video containers never decoded
    expect = {n for n in files if n not in ("e.bin", "f.avi", "h.mp4")}
    assert set(got) == expect
    for r in got.values():
        assert r.decode_error is None


def test_stream_video_fingerprints_match_batch(spark):
    """r11 video twin: streamed per-frame hashes equal the batch
    video_phash_df pass on the identical files; non-video media land
    as quarantine rows; the sink feeds the match join directly."""
    from vectra_py_spark.operators.videohash import (
        video_match_pairs,
        video_phash_df,
    )
    from vectra_py_spark.streaming.media import stream_video_fingerprints

    drop = tempfile.mkdtemp()
    sink = tempfile.mkdtemp() + "/out"
    ckpt = tempfile.mkdtemp() + "/ckpt"
    from vectra_py_spark.operators.avi import synth_avi

    files = {
        "v1.avi": synth_avi(5, 24, 16),
        "v2.avi": synth_avi(5, 24, 16),       # identical clip
        "v3.gif": mm.synth_gif(3, 24, 16),
        "junk.bin": b"\x00\x01not-a-video",
    }
    for name, payload in files.items():
        with open(os.path.join(drop, name), "wb") as f:
            f.write(payload)

    q = stream_video_fingerprints(media_file_stream(spark, drop), sink, ckpt)
    q.awaitTermination(120)
    streamed = spark.read.parquet(sink)

    rows = [
        (os.path.join(drop, n), p) for n, p in sorted(files.items())
    ]
    batch = video_phash_df(
        spark.createDataFrame(rows, ["media_id", "data"])
    )
    # binaryFile reports file: URIs; compare on basenames
    key = lambda r: (  # noqa: E731
        os.path.basename(r.media_id), r.frame_idx, r.phash, r.error,
    )
    assert sorted(map(key, streamed.collect())) == sorted(
        map(key, batch.collect())
    )
    # the identical AVIs match at offset 0 straight off the sink
    pairs = video_match_pairs(streamed, min_aligned=3).collect()
    pair_ids = {
        (os.path.basename(p.id_a), os.path.basename(p.id_b), p.offset)
        for p in pairs
    }
    assert ("v1.avi", "v2.avi", 0) in pair_ids


def test_stream_subtitle_cues_match_batch(spark):
    """r11 subtitle twin: streamed cues equal the batch
    subtitle_cues_df pass on the identical files; a file of invalid
    UTF-8 quarantines via U+FFFD (parses to whatever cues survive,
    never kills the batch); the sink aligns directly."""
    from vectra_py_spark.operators.subtitles import (
        align_cues_to_frames,
        subtitle_cues_df,
    )
    from vectra_py_spark.streaming.media import stream_subtitle_cues

    drop = tempfile.mkdtemp()
    sink = tempfile.mkdtemp() + "/out"
    ckpt = tempfile.mkdtemp() + "/ckpt"
    srt = (
        "1\n00:00:01,000 --> 00:00:02,000\nfirst cue\n\n"
        "2\n00:00:02,500 --> 00:00:03,500\nsecond cue\n"
    )
    vtt = "WEBVTT\n\n00:04.000 --> 00:05.000\n<c>tagged</c> text\n"
    files = {
        "a.srt": srt.encode(),
        "b.vtt": vtt.encode(),
        # invalid UTF-8 INSIDE a valid cue: U+FFFD lands in the text
        "c.srt": b"1\n00:00:01,000 --> 00:00:02,000\nbad \xff byte\n",
        "d.srt": b"no cues at all",
    }
    for name, payload in files.items():
        with open(os.path.join(drop, name), "wb") as f:
            f.write(payload)

    q = stream_subtitle_cues(media_file_stream(spark, drop), sink, ckpt)
    q.awaitTermination(120)
    streamed = spark.read.parquet(sink)

    rows = [
        (os.path.join(drop, n), p.decode("utf-8", errors="replace"))
        for n, p in sorted(files.items())
    ]
    batch = subtitle_cues_df(
        spark.createDataFrame(rows, ["media_id", "text"])
    )
    key = lambda r: (  # noqa: E731
        os.path.basename(r.media_id), r.cue_idx, r.start_ms,
        r.end_ms, r.cue_text, r.error,
    )
    got = sorted(map(key, streamed.collect()))
    assert got == sorted(map(key, batch.collect()))
    texts = {k[4] for k in got}
    assert "bad � byte" in texts  # U+FFFD quarantine, cue kept
    assert "tagged text" in texts
    # the sink is align-shaped: clip pairs straight off parquet
    # (binaryFile reports file: URIs — frame ids must match them)
    (a_uri,) = {
        r.media_id for r in streamed.collect()
        if os.path.basename(r.media_id) == "a.srt"
    }
    frames = spark.createDataFrame(
        [(a_uri, i) for i in range(8)], ["media_id", "frame_idx"]
    )
    clips = align_cues_to_frames(streamed, frames, fps=2.0).collect()
    assert {(r.cue_idx, r.frame_ms) for r in clips} == {
        (0, 1000), (0, 1500), (1, 2500), (1, 3000)
    }
