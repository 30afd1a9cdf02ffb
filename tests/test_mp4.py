"""MJPEG-in-MP4 (ISO-BMFF): box-tree parse round-trips, the general
stsc chunk→sample mapping, co64/largesize paths, byte-exact frame
extraction, the ValueError-only malformed contract, sniff/auto/
quarantine integration, and the DataFrame sampler (reference parity:
the MP4 container decode the reference delegates to codec libraries;
H.264/HEVC DECODE stays a declared gate — the container no longer
is)."""

import struct

import numpy as np
import pytest

from vectra_py_spark.operators import multimodal as mm
from vectra_py_spark.operators.jpeg import decode_jpeg, encode_jpeg
from vectra_py_spark.operators.mp4 import (
    decode_mp4,
    encode_mp4_mjpeg,
    mp4_frame_payloads,
    mp4_info,
    synth_mp4,
)


def test_roundtrip_and_info():
    p = synth_mp4(5, 24, 16)
    info = mp4_info(p)
    assert (info["width"], info["height"], info["n_frames"]) == (24, 16, 5)
    arr = decode_mp4(p)
    assert arr.shape == (5, 16, 24, 1)
    assert [int(a.min()) for a in arr] == [40, 75, 110, 145, 180]


def test_frame_payloads_are_byte_exact():
    rng = np.random.default_rng(5)
    frames = [
        encode_jpeg(rng.integers(0, 256, (16, 24), np.uint8), quality=85)
        for _ in range(4)
    ]
    p = encode_mp4_mjpeg(frames, 24, 16)
    assert mp4_frame_payloads(p) == frames


def test_multi_chunk_stsc_and_co64():
    """Real MP4s spread samples over many chunks with a run-length
    stsc; rebuild a two-run layout (2 chunks × 2 samples, then 1 chunk
    × 1 sample) with co64 offsets and verify the general walk."""
    from vectra_py_spark.operators import mp4 as M

    frames = [
        encode_jpeg(np.full((8, 8), 30 * i + 10, np.uint8)) for i in range(5)
    ]
    std = M.encode_mp4_mjpeg(frames, 8, 8)
    # locate the standard boxes to reuse everything but stsc/stco
    ftyp_len = struct.unpack_from(">I", std, 0)[0]
    mdat_payload = ftyp_len + 8
    # chunk layout: [f0 f1] [f2 f3] [f4] at their natural offsets
    offs = []
    off = mdat_payload
    for f in frames:
        offs.append(off)
        off += len(f)
    chunk_offsets = [offs[0], offs[2], offs[4]]
    stsc = M._full(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)   # chunks 1-2: 2 samples each
        + struct.pack(">III", 3, 1, 1),  # chunk 3: 1 sample
    )
    co64 = M._full(
        b"co64", 0, 0,
        struct.pack(">I", 3) + struct.pack(">3Q", *chunk_offsets),
    )
    # splice: replace the original stsc and stco inside the moov bytes
    moov_start = std.index(b"moov") - 4
    moov = bytearray(std[moov_start:])

    def replace_box(buf: bytearray, fourcc: bytes, new: bytes) -> bytearray:
        i = bytes(buf).index(fourcc) - 4
        (size,) = struct.unpack_from(">I", buf, i)
        out = buf[:i] + new + buf[i + size :]
        return out

    moov = replace_box(moov, b"stsc", stsc)
    moov = replace_box(moov, b"stco", co64)
    # fix ancestor box sizes (moov/trak/mdia/minf/stbl all grew)
    delta = len(moov) - (len(std) - moov_start)
    out = bytearray(std[:moov_start] + moov)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        i = bytes(out).index(fourcc) - 4
        (size,) = struct.unpack_from(">I", out, i)
        struct.pack_into(">I", out, i, size + delta)
    got = mp4_frame_payloads(bytes(out))
    assert got == frames


def test_malformed_payloads_raise_valueerror_only():
    p = synth_mp4(3, 16, 16)
    with pytest.raises(ValueError):
        decode_mp4(b"")
    with pytest.raises(ValueError, match="not an MP4"):
        decode_mp4(b"RIFF1234AVI LIST")
    for cut in (6, 10, 30, len(p) // 3, len(p) - 2):
        with pytest.raises(ValueError):
            decode_mp4(p[:cut])
    with pytest.raises(ValueError, match="avc1"):
        decode_mp4(p.replace(b"jpeg", b"avc1", 1))
    # a sample that is not JPEG
    bad = bytearray(p)
    i = bytes(bad).index(b"\xff\xd8")
    bad[i : i + 2] = b"PK"
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_mp4(bytes(bad))
    with pytest.raises(ValueError, match="at least one frame"):
        encode_mp4_mjpeg([], 8, 8)
    with pytest.raises(ValueError, match="not a JPEG"):
        encode_mp4_mjpeg([b"zzz"], 8, 8)


def test_sniff_auto_quarantine_and_sampler(spark):
    p = synth_mp4(6, 16, 8)
    assert mm.sniff_media_type(p) == "mp4"
    feats = mm.DECODERS["auto"](p)
    assert feats[mm.FEATURE_DIM - 1] == pytest.approx(float(np.log1p(6)))
    df = spark.createDataFrame(
        [
            ("m6", "video", bytearray(p), {}),
            ("mbad", "video", bytearray(p[: len(p) // 2]), {}),
            ("mnull", "video", None, {}),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in
            mm.extract_features(df, decoder="auto", on_error="quarantine")
            .collect()}
    assert rows["m6"].decode_error is None
    assert rows["mbad"].decode_error is not None
    sampled = sorted(
        mm.sample_mp4_frames(df.filter("media_id != 'mbad'"), n_frames=3)
        .collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.media_id for r in sampled] == ["m6"] * 3
    assert [r.src_frame for r in sampled] == [0, 2, 4]
    src = decode_mp4(p)
    for r in sampled:
        assert np.array_equal(decode_jpeg(bytes(r.frame)), src[r.src_frame])


def test_avi_and_mp4_carry_identical_frames():
    """The two containers over the same JPEG frames extract the same
    bytes — container-independence of the frame pipeline."""
    from vectra_py_spark.operators.avi import avi_frame_payloads, encode_avi_mjpeg

    rng = np.random.default_rng(17)
    frames = [
        encode_jpeg(rng.integers(0, 256, (16, 16), np.uint8)) for _ in range(3)
    ]
    a = avi_frame_payloads(encode_avi_mjpeg(frames, 16, 16))
    m = mp4_frame_payloads(encode_mp4_mjpeg(frames, 16, 16))
    assert a == m == frames


def test_video_resize_both_containers(spark):
    """resize_media handles the video containers: every frame
    resamples through the JPEG codec and the payload re-containers,
    round-tripping through decode and the frame samplers."""
    rng = np.random.default_rng(23)
    frames = [
        encode_jpeg(rng.integers(0, 256, (16, 24), np.uint8)) for _ in range(3)
    ]
    from vectra_py_spark.operators.avi import decode_avi, encode_avi_mjpeg

    rows = [
        ("v_avi", "video", bytearray(encode_avi_mjpeg(frames, 24, 16)), {}),
        ("v_mp4", "video", bytearray(encode_mp4_mjpeg(frames, 24, 16)), {}),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    for name, dec in (("v_avi", decode_avi), ("v_mp4", decode_mp4)):
        out = mm.resize_media(
            df.filter(f"media_id = '{name}'"), 12, 8,
            resizer=name.split("_")[1],
        ).collect()[0]
        arr = dec(bytes(out.data))
        assert arr.shape == (3, 8, 12, 1)
        assert out.meta["out_w"] == "12" and out.meta["out_h"] == "8"
