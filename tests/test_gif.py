"""GIF codec: LZW round-trips (incl. dictionary overflow and the KwKwK
case), interlace, transparency/disposal compositing, the ValueError-only
malformed contract, and REAL frame sampling through the DataFrame API —
the honest multi-frame counterpart of sample_frames' byte slicing."""

import struct

import numpy as np
import pytest

from vectra_py_spark.operators import multimodal as mm
from vectra_py_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_lzw_roundtrip_and_kwkwk():
    """The LZW pair pinned against each other on the classic KwKwK
    stream (aaaa… forces code == next_code immediately) and on random
    few-symbol data that forces width growth."""
    for seq in (
        np.zeros(50, np.uint8),  # KwKwK: run of one symbol
        np.array([0, 1, 0, 1, 0, 1, 0], np.uint8),
        np.random.default_rng(5).integers(0, 4, 5000).astype(np.uint8),
    ):
        enc = _lzw_encode(seq, 2)
        dec = _lzw_decode(enc, 2, len(seq))
        assert np.array_equal(dec, seq)


def test_single_frame_lossless_roundtrip():
    img = mm.decode_ppm(mm.synth_ppm(32, 16)) // 32 * 32  # ≤256 colors
    out = decode_gif(encode_gif(img))
    assert out.shape == (1, 16, 32, 3)
    assert np.array_equal(out[0], img)


def test_animated_roundtrip_and_dict_overflow():
    frames = np.zeros((5, 20, 30, 3), np.uint8)
    frames[:, :, :, 2] = 40
    for i in range(5):
        frames[i, 5:15, i * 5 : i * 5 + 5] = [255, 0, 0]
    out = decode_gif(encode_gif(frames, delay_cs=4))
    assert np.array_equal(out, frames)
    # large noisy frame: LZW dictionary overflows and re-clears
    rng = np.random.default_rng(3)
    big = rng.integers(0, 8, (200, 300), dtype=np.uint8) * 30
    big3 = np.stack([big, 255 - big, np.full_like(big, 7)], axis=2)
    payload = encode_gif(big3)
    assert np.array_equal(decode_gif(payload)[0], big3)
    assert len(payload) < big3.nbytes // 2  # actually compresses


def test_interlaced_frames_deinterlace():
    """Hand-build an interlaced frame: rows stored in the four GIF
    passes must come back in natural order."""
    img = np.zeros((10, 4, 3), np.uint8)
    for r in range(10):
        img[r] = [r * 20, 0, 0]
    base = encode_gif(img)
    # rewrite the one image descriptor as interlaced with rows permuted
    # into pass order (8/8 from 0, 8/8 from 4, 4/4 from 2, 2/2 from 1)
    order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, 10, st)]
    perm = img[order]
    payload = bytearray(encode_gif(perm))
    # find the image descriptor (0x2C) and set the interlace bit
    i = payload.index(0x2C)
    payload[i + 9] |= 0x40
    out = decode_gif(bytes(payload))
    assert np.array_equal(out[0], img)


def test_transparency_and_disposal_compositing():
    """Multi-frame compositing: frame 2 changes only a sub-rect; the
    rest of its composited output must show frame 1's pixels. Then a
    hand-marked transparent index: transparent pixels must show the
    prior canvas through."""
    f1 = np.full((8, 8, 3), 10, np.uint8)
    f2 = f1.copy()
    f2[2:6, 2:6] = 200
    out = decode_gif(encode_gif(np.stack([f1, f2])))
    assert np.array_equal(out[0], f1)
    assert np.array_equal(out[1], f2)
    assert out[1][0, 0, 0] == 10  # untouched pixels persist

    # transparency: declare palette index of value 10 transparent in
    # frame 2 via a hand-inserted Graphic Control Extension
    payload = bytearray(encode_gif(np.stack([f1, f2]), delay_cs=2))
    # frame 2's GCE is the second 0x21 0xF9 block; set transparent flag
    # and index. palette is unique-sorted: index 0 = color 10.
    gce_positions = [
        i for i in range(len(payload) - 1)
        if payload[i] == 0x21 and payload[i + 1] == 0xF9
    ]
    assert len(gce_positions) == 2
    g = gce_positions[1]
    payload[g + 3] |= 0x01  # transparent color flag
    payload[g + 6] = 1  # transparent index = 1 (color 200)
    out2 = decode_gif(bytes(payload))
    # the 200-rect was transparent → frame 1's 10s show through
    assert np.array_equal(out2[1], f1)


def test_malformed_payloads_raise_valueerror_only():
    img = mm.decode_ppm(mm.synth_ppm(16, 8)) // 32 * 32
    payload = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b"")
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG\r\n whatever")
    for cut in (4, 8, 12, 14, len(payload) // 2, len(payload) - 1):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])
    # frame rect outside the logical screen
    bad = bytearray(payload)
    i = bad.index(0x2C)
    bad[i + 5] = 99  # frame width low byte → rect overflows screen
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))
    # corrupt LZW stream
    bad2 = bytearray(payload)
    bad2[i + 12 : i + 20] = b"\xff" * 8
    with pytest.raises(ValueError):
        decode_gif(bytes(bad2))


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_gif(np.zeros((4, 4, 3), np.float32))
    with pytest.raises(ValueError, match="quantize upstream"):
        rgb = np.arange(16 * 64 * 3, dtype=np.uint8).reshape(16, 64, 3)
        rgb[:, :, 0] = np.arange(64, dtype=np.uint8)[None, :] * 4
        rgb[:, :, 1] = np.arange(16, dtype=np.uint8)[:, None] * 16
        encode_gif(rgb)  # 64*16 > 256 unique colors


@pytest.mark.slow
def test_gif_through_dataframe_api(spark):
    """extract_features / resize_media / sample_gif_frames on real
    animated payloads — the video-shaped pipeline end-to-end."""
    p6 = mm.synth_gif(n_frames=6, width=30, height=20)
    p1 = mm.synth_gif(n_frames=1, width=30, height=20)
    df = spark.createDataFrame(
        [
            ("g6", "video", bytearray(p6), {}),
            ("g1", "image", bytearray(p1), {}),
            ("g0", "video", None, {}),
        ],
        mm.MEDIA_SCHEMA,
    )
    feats = {
        r.media_id: r.features
        for r in mm.extract_features(df, decoder="gif").collect()
    }
    assert feats["g0"] == [0.0] * mm.FEATURE_DIM
    # last slot = log1p(n_frames): separates animated from static
    assert abs(feats["g6"][-1] - np.log1p(6)) < 1e-9
    assert abs(feats["g1"][-1] - np.log1p(1)) < 1e-9

    # resize preserves the frame count and dims metadata
    resized = mm.resize_media(df.filter("media_id = 'g6'"), 10, 8, resizer="gif")
    r = resized.collect()[0]
    out = mm.decode_gif(bytes(r.data))
    assert out.shape == (6, 8, 10, 3)

    # REAL frame sampling: 3 of 6 actual frames, evenly spaced
    sampled = mm.sample_gif_frames(df, n_frames=3).collect()
    by_id = {}
    for row in sampled:
        by_id.setdefault(row.media_id, []).append(row)
    assert set(by_id) == {"g6", "g1"}  # NULL payload → no rows
    rows6 = sorted(by_id["g6"], key=lambda r: r.frame_idx)
    assert [r.src_frame for r in rows6] == [0, 2, 4]
    src = mm.decode_gif(p6)
    for row in rows6:
        frame = mm.decode_gif(bytes(row.frame))
        assert frame.shape[0] == 1
        assert np.array_equal(frame[0], src[row.src_frame])
    # sampled single-frame payloads compose with feature extraction
    fdf = spark.createDataFrame(
        [(r.media_id + f"#{r.frame_idx}", "image", bytearray(bytes(r.frame)), {}) for r in rows6],
        mm.MEDIA_SCHEMA,
    )
    assert mm.extract_features(fdf, decoder="gif").count() == 3


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw LZW bytes in GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def test_disposal2_restores_global_background_under_local_table():
    """GIF89a: the logical-screen background color index refers to the
    GLOBAL color table. A frame that carries a small LOCAL table and
    disposal=2 must restore the region from gct[bg] — not index the
    local table (which here doesn't even contain the bg index)."""
    from vectra_py_spark.operators.gif import _lzw_encode

    # global table: 8 grays, bg index 5 → (50, 50, 50)
    gct = bytes(v for i in range(8) for v in (i * 10, i * 10, i * 10))
    payload = bytearray(b"GIF89a")
    payload += struct.pack("<HHBBB", 8, 8, 0xF2, 5, 0)
    payload += gct
    # frame 1: disposal=2, full screen, LOCAL 4-entry table, all index 1
    payload += bytes([0x21, 0xF9, 0x04, 2 << 2, 0, 0, 0, 0])
    payload += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, 8, 8, 0x81)
    payload += bytes([200, 0, 0, 0, 200, 0, 0, 0, 200, 255, 255, 255])
    idx1 = np.full(64, 1, np.uint8)
    payload += bytes([2]) + _sub_blocks(_lzw_encode(idx1, 2))
    # frame 2: no GCE, 2x2 at origin from the GLOBAL table, index 7
    payload += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, 2, 2, 0x00)
    idx2 = np.full(4, 7, np.uint8)
    payload += bytes([3]) + _sub_blocks(_lzw_encode(idx2, 3))
    payload += bytes([0x3B])

    out = decode_gif(bytes(payload))
    assert out.shape == (2, 8, 8, 3)
    # frame 1 painted from the local table
    assert np.array_equal(out[0], np.full((8, 8, 3), (0, 200, 0), np.uint8))
    # frame 2: disposal-2 restored background = gct[5] = (50,50,50),
    # with the 2x2 overlay = gct[7] = (70,70,70)
    want = np.full((8, 8, 3), 50, np.uint8)
    want[0:2, 0:2] = 70
    assert np.array_equal(out[1], want)
