"""Baseline JPEG codec: math pinned against independent references,
round-trips, restart segments, and the ValueError-only malformed
contract (reference parity: this is the compressed-image gap VERDICT r5
item 4 names — multimodal decode the reference delegates to codec
libraries, re-expressed container-native like PNG/BMP before it)."""

import numpy as np
import pytest

from vectra_py_spark.operators import multimodal as mm
from vectra_py_spark.operators.jpeg import (
    _A,
    _ZIGZAG,
    _round_half_away,
    _scaled_quant,
    _QUANT_LUMA,
    decode_jpeg,
    encode_jpeg,
)


def _naive_dct2(block: np.ndarray) -> np.ndarray:
    """Independent O(64²) direct-sum DCT-II (the textbook double-cosine
    formula, no shared code with the codec's matrix form)."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def test_dct_matrix_matches_independent_direct_sum():
    """The codec's orthonormal-matrix FDCT/IDCT pinned against an
    independently-written direct-sum DCT-II — the 'golden block'
    independence check."""
    rng = np.random.default_rng(7)
    block = rng.integers(0, 256, (8, 8)).astype(np.float64)
    want = _naive_dct2(block)
    got = _A.T @ block @ _A
    assert np.allclose(got, want, atol=1e-9)
    # inverse: IDCT(FDCT(x)) == x and matches the matrix identity
    assert np.allclose(_A @ got @ _A.T, block, atol=1e-9)
    assert np.allclose(_A @ _A.T, np.eye(8), atol=1e-12)


def test_zigzag_is_its_own_shape_check():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    # T.81 Figure 5 first/last entries
    assert _ZIGZAG[0] == 0 and _ZIGZAG[1] == 1 and _ZIGZAG[2] == 8
    assert _ZIGZAG[-1] == 63


def test_flat_image_reconstructs_in_closed_form():
    """DC-only blocks: the decoded pixel equals the closed-form
    quantize→dequantize→IDCT arithmetic for EVERY grayscale value —
    the invariant the `jpeg_roundtrip` oracle entry checks cross-engine
    (q00 = 5 at quality 85; IDCT of a DC-only block is DC/8 + 128)."""
    assert int(_scaled_quant(_QUANT_LUMA, 85)[0]) == 5
    for v in (0, 1, 63, 127, 128, 129, 200, 254, 255):
        img = np.full((10, 13), v, np.uint8)  # non-multiple-of-8 dims
        out = decode_jpeg(encode_jpeg(img, quality=85))
        assert out.shape == (10, 13, 1)
        dc = _round_half_away(np.array(8.0 * (v - 128) / 5.0))
        px = int(min(255, max(0, _round_half_away(dc * 5.0 / 8.0 + 128.0))))
        assert int(out.min()) == int(out.max()) == px, v


def test_rgb_roundtrip_psnr():
    img = mm.decode_ppm(mm.synth_ppm(37, 23))
    for quality, subsample, floor in [
        (95, False, 44.0),
        (85, False, 40.0),
        (85, True, 32.0),
        (50, True, 28.0),
    ]:
        out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
        assert out.shape == img.shape
        rmse = np.sqrt(((out.astype(float) - img.astype(float)) ** 2).mean())
        psnr = 20 * np.log10(255.0 / max(rmse, 1e-9))
        assert psnr > floor, (quality, subsample, psnr)


def test_grayscale_roundtrip():
    img = mm.decode_ppm(mm.synth_ppm(32, 17)).mean(axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (17, 32, 1)
    rmse = np.sqrt(((out[:, :, 0].astype(float) - img.astype(float)) ** 2).mean())
    assert rmse < 2.0


def test_restart_intervals_do_not_change_pixels():
    """DRI/RSTn segments re-partition the entropy stream (the unit a
    parallel decoder splits at) without touching pixel content."""
    img = mm.decode_ppm(mm.synth_ppm(64, 48))
    base = decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 2, 3, 7):
        out = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=ri))
        assert np.array_equal(out, base), ri
    # 4:2:0 MCUs (6 blocks each) across a restart boundary
    a = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))
    b = decode_jpeg(
        encode_jpeg(img, quality=85, subsample=True, restart_interval=2)
    )
    assert np.array_equal(a, b)


def test_pinned_payload_and_pixels_are_deterministic():
    """Cross-run determinism pin: fixed input → byte-identical payload
    and pixel-identical decode (no clock, RNG, or dict-order leakage)."""
    img = mm.decode_ppm(mm.synth_ppm(24, 16))
    p1 = encode_jpeg(img, quality=85)
    p2 = encode_jpeg(img, quality=85)
    assert p1 == p2
    o1, o2 = decode_jpeg(p1), decode_jpeg(p2)
    assert np.array_equal(o1, o2)
    # soft-pinned magnitudes: JFIF header present, sane compression
    assert p1[:2] == b"\xff\xd8" and p1[-2:] == b"\xff\xd9"
    assert b"JFIF" in p1[:20]
    assert len(p1) < img.nbytes  # actually compresses the gradient


def test_malformed_payloads_raise_valueerror_only():
    """Corpus-robustness contract (same as PNG/BMP): ANY malformed
    payload refuses with ValueError — never struct.error / KeyError /
    IndexError escaping into a Spark stage."""
    img = mm.decode_ppm(mm.synth_ppm(16, 16))
    payload = encode_jpeg(img, quality=85)

    with pytest.raises(ValueError):
        decode_jpeg(b"")
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"PK\x03\x04 not a jpeg")
    # truncation at every marker-segment boundary and mid-entropy
    for cut in (2, 3, 4, 10, 21, 25, 90, len(payload) // 2, len(payload) - 2):
        with pytest.raises(ValueError):
            decode_jpeg(payload[:cut])
    # progressive frames refuse loudly (SOF0 -> SOF2)
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(prog)
    # corrupt entropy data → invalid Huffman code or truncated stream
    body = bytearray(payload)
    body[-20:-2] = bytes(18)  # stomp scan bytes, keep EOI
    with pytest.raises(ValueError):
        decode_jpeg(bytes(body))
    # missing EOI
    with pytest.raises(ValueError):
        decode_jpeg(payload[:-2])


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), np.float64))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((8, 8), np.uint8), quality=0)
    with pytest.raises(ValueError, match="shape"):
        encode_jpeg(np.zeros((8, 8, 2), np.uint8))
    with pytest.raises(ValueError, match="shape"):
        encode_jpeg(np.zeros((0, 8, 3), np.uint8))


def test_jpeg_through_dataframe_api(spark):
    """The Spark surface: JPEG payloads flow through extract_features
    and resize_media like every other registered codec — narrow
    mapInPandas, no payload in any shuffle."""
    img = mm.decode_ppm(mm.synth_ppm(40, 24))
    rows = [
        ("j1", "image", bytearray(encode_jpeg(img, quality=90)), {}),
        ("j2", "image", bytearray(encode_jpeg(img, quality=60, subsample=True)), {}),
        ("j3", "image", None, {}),  # NULL payload → zero features
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r.media_id: r.features for r in mm.extract_features(df, decoder="jpeg").collect()}
    assert len(feats) == 3
    assert feats["j3"] == [0.0] * mm.FEATURE_DIM
    # log-dim features match the real decoded dims
    assert abs(feats["j1"][0] - np.log1p(40)) < 1e-9
    assert abs(feats["j1"][1] - np.log1p(24)) < 1e-9
    # q60 4:2:0 and q90 4:4:4 decode to similar (not identical) stats
    assert abs(feats["j1"][3] - feats["j2"][3]) < 0.05

    resized = mm.resize_media(df.filter("media_id != 'j3'"), 16, 8, resizer="jpeg")
    for r in resized.collect():
        out = decode_jpeg(bytes(r.data))
        assert out.shape == (8, 16, 3)
        assert r.meta["out_w"] == "16" and r.meta["out_h"] == "8"
