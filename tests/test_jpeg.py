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
    # a baseline stream merely relabeled SOF2 is malformed progressive
    # (its single scan claims the full band with Se=63 on a DC scan)
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # genuinely unsupported frame types still refuse loudly
    lossless = payload.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(lossless)
    # corrupt entropy data → invalid Huffman code or truncated stream
    body = bytearray(payload)
    body[-20:-2] = bytes(18)  # stomp scan bytes, keep EOI
    with pytest.raises(ValueError):
        decode_jpeg(bytes(body))
    # missing EOI
    with pytest.raises(ValueError):
        decode_jpeg(payload[:-2])


def test_progressive_equals_baseline_exactly():
    """Progressive is a lossless REORGANIZATION of the same quantized
    coefficients: for every quality/subsampling/shape, the SOF2 payload
    must decode to pixels IDENTICAL to the baseline payload's. This
    single property pins the whole Annex G machinery (spectral bands,
    DC/AC successive approximation, EOB runs, buffered correction
    bits) against the independently-written baseline path."""
    img = mm.decode_ppm(mm.synth_ppm(37, 23))
    for quality in (95, 85, 50):
        for subsample in (False, True):
            base = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
            prog = decode_jpeg(
                encode_jpeg(img, quality=quality, subsample=subsample, progressive=True)
            )
            assert np.array_equal(base, prog), (quality, subsample)
    # grayscale + odd dims with 4:2:0 (grid-edge stress)
    g = img.mean(axis=2).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=90)),
        decode_jpeg(encode_jpeg(g, quality=90, progressive=True)),
    )
    img2 = mm.decode_ppm(mm.synth_ppm(41, 29))
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img2, quality=80, subsample=True)),
        decode_jpeg(encode_jpeg(img2, quality=80, subsample=True, progressive=True)),
    )
    # randomized content: 20 noise images
    rng = np.random.default_rng(11)
    for _ in range(20):
        h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        noisy = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(noisy, quality=75)),
            decode_jpeg(encode_jpeg(noisy, quality=75, progressive=True)),
        )


def test_progressive_ac_scan_primitives_property():
    """The AC first+refine pair round-trips 300 random coefficient
    blocks bit-exactly (encoder and decoder exercised below the file
    layer, with explicit byte unstuffing)."""
    from vectra_py_spark.operators import jpeg as J

    act = J._decode_table(*J._AC_LUMA)
    rng = np.random.default_rng(2)
    for _ in range(300):
        zt = np.zeros(64, np.int32)
        n = int(rng.integers(0, 30))
        idx = rng.choice(np.arange(1, 64), n, replace=False)
        zt[idx] = rng.integers(-300, 300, n)
        c = {
            "coefzz": zt.reshape(1, 1, 64), "bh": 1, "bw": 1,
            "codes_ac": J._canonical_codes(*J._AC_LUMA),
        }
        b1 = J._BitWriter()
        J._emit_ac_first(b1, c, 1, 63, 1)
        b2 = J._BitWriter()
        J._emit_ac_refine(b2, c, 1, 63, 0)
        z = np.zeros(64, np.int32)
        J._ac_first_block(
            J._BitReader(b1.flush().replace(b"\xff\x00", b"\xff")),
            act, z, 1, 63, 1, 0,
        )
        J._ac_refine_block(
            J._BitReader(b2.flush().replace(b"\xff\x00", b"\xff")),
            act, z, 1, 63, 0, 0,
        )
        assert np.array_equal(z[1:], zt[1:])


def test_progressive_handbuilt_eobrun_restarts_and_dht_redefine():
    """Paths our encoder never emits, exercised with a hand-assembled
    progressive stream: EOBn with r=1 (a 2-block EOB run), RSTn restarts
    inside a progressive DC scan, DRI redefinition between scans, and a
    DHT defined AFTER the first scan. Grayscale 24x8 (3 blocks), all-1
    quant table; expected pixels computed from the coefficients
    directly with an independent IDCT expression."""
    import struct

    from vectra_py_spark.operators import jpeg as J

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    # DQT: table 0, all ones (zigzag order is all ones too)
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    # SOF2: 8-bit, h=8, w=24, 1 component id=1 hv=1x1 tq=0
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 24, 1) + bytes([1, 0x11, 0]))
    # DC table 0: single symbol 0x00 (all diffs zero), code '0'
    out += seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0x00]))
    # DRI: restart every 2 MCUs (applies to the DC scan)
    out += seg(0xDD, struct.pack(">H", 2))
    # scan 1: DC first, Al=0 — 3 MCUs, bits '0','0' | RST0 | '0'
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    out += bytes([0b00111111])  # two '0' bits + 1-padding
    out += b"\xff\xd0"  # RST0
    out += bytes([0b01111111])  # one '0' bit + padding
    # between scans: disable restarts, define the AC table
    out += seg(0xDD, struct.pack(">H", 0))
    # AC table 0: 0x01→'0' (len1), 0x00→'10', 0x10→'11' (len2)
    out += seg(
        0xC4,
        bytes([0x10]) + bytes([1, 2] + [0] * 14) + bytes([0x01, 0x00, 0x10]),
    )
    # scan 2: AC first, Ss=1 Se=63 Ah=0 Al=0
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    # block1: 0x01 ('0') + mag bit '1' (coef +1 at zigzag k=1) + EOB0
    # ('10'); blocks 2-3: EOB1 ('11') + 1 extra bit '0' (run = 2);
    # bit stream 0,1,1,0,1,1,0 + 1-bit pad → 0b01101101
    out += bytes([0b01101101])
    out += b"\xff\xd9"
    decoded = J.decode_jpeg(bytes(out))
    assert decoded.shape == (8, 24, 1)
    # expected: blocks 2,3 flat 128; block 1 = IDCT of nat[0,1]=1 (+128)
    nat = np.zeros((8, 8))
    nat[0, 1] = 1.0  # zigzag index 1 → natural (0,1); q=1
    blk = J._A @ nat @ J._A.T + 128.0
    want = np.clip(np.trunc(blk + np.copysign(0.5, blk)), 0, 255).astype(np.uint8)
    assert np.array_equal(decoded[:, :8, 0], want)
    assert (decoded[:, 8:, 0] == 128).all()


def test_progressive_malformed_payloads_raise_valueerror_only():
    img = mm.decode_ppm(mm.synth_ppm(24, 16))
    payload = encode_jpeg(img, quality=85, progressive=True)
    out = decode_jpeg(payload)
    assert out.shape == (16, 24, 3)
    for cut in (30, 60, 120, len(payload) // 2, len(payload) - 2):
        with pytest.raises(ValueError):
            decode_jpeg(payload[:cut])
    # multi-component AC scan is illegal in progressive
    with pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg(img, progressive=True, restart_interval=2)


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


def test_zero_sampling_factor_raises_valueerror():
    """A SOF sampling-factor nibble of 0 must refuse with ValueError —
    never ZeroDivisionError escaping into a quarantine-mode stage
    (ADVICE r6: the crawl-robustness contract)."""
    img = mm.decode_ppm(mm.synth_ppm(16, 16))
    payload = bytearray(encode_jpeg(img, quality=85))
    i = bytes(payload).index(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) ncomp(1) then cid, hv, tq
    hv_off = i + 2 + 2 + 6 + 1
    for bad in (0x00, 0x20, 0x02, 0x50, 0x15):
        p = bytearray(payload)
        p[hv_off] = bad
        with pytest.raises(ValueError):
            decode_jpeg(bytes(p))


def _gray_jpeg_2x2(img: np.ndarray, quality: int, progressive: bool) -> bytes:
    """Hand-build a single-component JPEG that DECLARES 2x2 sampling
    factors (as grayscale transcodes of color files do) with the scan
    emitted in the spec's NON-interleaved order: one block per MCU,
    row-major over ceil(dims/8) — T.81 A.2."""
    import struct as st

    from vectra_py_spark.operators import jpeg as J

    h, w = img.shape
    ql = J._scaled_quant(J._QUANT_LUMA, quality).reshape(8, 8).astype(np.float64)
    bh, bw = -(-h // 8), -(-w // 8)
    plane = np.pad(
        img.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )
    codes_dc = J._canonical_codes(*J._DC_LUMA)
    codes_ac = J._canonical_codes(*J._AC_LUMA)

    def seg(marker: int, body: bytes) -> bytes:
        return st.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    lz = J._scaled_quant(J._QUANT_LUMA, quality)[J._ZIGZAG]
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in lz))
    # the lie under test: ncomp=1 but sampling factors 2x2
    out += seg(
        0xC2 if progressive else 0xC0,
        st.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x22, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(J._DC_LUMA[0]) + bytes(J._DC_LUMA[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(J._AC_LUMA[0]) + bytes(J._AC_LUMA[1]))

    if not progressive:
        out += bytes(
            st.pack(">BBH", 0xFF, 0xDA, 8) + bytes([1, 1, 0x00, 0, 63, 0])
        )
        wr = J._BitWriter()
        pred = 0
        for by in range(bh):
            for bx in range(bw):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                pred = J._encode_block(wr, blk, ql, pred, codes_dc, codes_ac)
        out += wr.flush()
    else:
        coefzz = J._quantize_blocks(plane, ql)
        # DC scan (Ss=Se=0, Ah=Al=0): non-interleaved row-major
        out += bytes(
            st.pack(">BBH", 0xFF, 0xDA, 8) + bytes([1, 1, 0x00, 0, 0, 0])
        )
        wr = J._BitWriter()
        pred = 0
        for by in range(bh):
            for bx in range(bw):
                v = int(coefzz[by, bx, 0])
                diff = v - pred
                pred = v
                s = J._category(diff)
                code, ln = codes_dc[s]
                wr.write(code, ln)
                if s:
                    wr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        out += wr.flush()
        # AC scan (Ss=1, Se=63, Ah=Al=0) over the same grid
        out += bytes(
            st.pack(">BBH", 0xFF, 0xDA, 8) + bytes([1, 1, 0x00, 1, 63, 0])
        )
        wr = J._BitWriter()
        c = {"coefzz": coefzz, "bh": bh, "bw": bw, "codes_ac": codes_ac}
        J._emit_ac_first(wr, c, 1, 63, 0)
        out += wr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_single_component_scan_is_noninterleaved():
    """Grayscale frames that RETAIN 2x2 sampling factors (color files
    transcoded to gray) must decode block-row-major per T.81 A.2 —
    identical pixels to the plain 1x1 encoding, since the quantized
    blocks are the same and sampling factors are ignored in a
    one-component scan. Covers baseline AND the progressive DC path."""
    rng = np.random.default_rng(11)
    for h, w in ((16, 16), (24, 16), (20, 28)):  # multiple-of-16 + ragged
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        want = decode_jpeg(encode_jpeg(img, quality=85))
        got = decode_jpeg(_gray_jpeg_2x2(img, 85, progressive=False))
        assert np.array_equal(got, want), f"baseline {h}x{w}"
        got_p = decode_jpeg(_gray_jpeg_2x2(img, 85, progressive=True))
        assert np.array_equal(got_p, want), f"progressive {h}x{w}"
