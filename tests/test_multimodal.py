"""Multimodal binary-column plumbing (stubbed decode, real Spark shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return mm.attach_binary_payload(docs, modality="image")


def test_schema_shape(media):
    kinds = dict(media.dtypes)
    assert kinds["data"] == "binary"
    assert kinds["modality"] == "string"
    assert kinds["meta"].startswith("map")


def test_fake_feature_extraction(media):
    out = mm.extract_features(media, decoder="fake").collect()
    assert len(out) == media.count()
    for r in out[:10]:
        assert len(r.features) == mm.FEATURE_DIM
        sq = sum(x * x for x in r.features)
        assert sq == pytest.approx(1.0, rel=1e-9)
        assert r.n_bytes > 0


def test_byte_length_matches_meta(media):
    rows = media.select(
        "media_id", F.octet_length("data").alias("n"), F.col("meta")["n_bytes"].alias("m")
    ).collect()
    for r in rows:
        assert int(r.m) == r.n


def test_real_decoder_raises_not_implemented(media):
    with pytest.raises(NotImplementedError, match="image"):
        mm.extract_features(media, decoder="image")


def test_null_payload_handled(spark):
    df = spark.createDataFrame(
        [("a", "image", None, None)], mm.MEDIA_SCHEMA
    )
    out = mm.extract_features(df, decoder="fake").collect()
    assert out[0].n_bytes == 0
    assert len(out[0].features) == mm.FEATURE_DIM


def test_sample_frames_reconstructs_payload(media):
    n = 5
    frames = mm.sample_frames(media, n_frames=n)
    rows = frames.collect()
    originals = {
        r["media_id"]: bytes(r["data"]) for r in media.collect()
    }
    assert len(rows) == len(originals) * n
    by_id: dict = {}
    for r in sorted(rows, key=lambda r: (r["media_id"], r["frame_idx"])):
        by_id.setdefault(r["media_id"], b"")
        assert r["n_bytes"] == len(bytes(r["frame"]) if r["frame"] is not None else b"")
        by_id[r["media_id"]] += bytes(r["frame"]) if r["frame"] is not None else b""
    for mid, payload in by_id.items():
        assert payload == originals[mid]  # exact reconstruction


def test_resize_media_sets_dims_and_composes(media):
    out = mm.resize_media(media, width=8, height=4)
    rows = out.collect()
    for r in rows:
        assert len(bytes(r["data"])) == 8 * 4
        assert r["meta"]["out_w"] == "8" and r["meta"]["out_h"] == "4"
    # deterministic: same input → same resized bytes
    again = {r["media_id"]: bytes(r["data"]) for r in mm.resize_media(media, 8, 4).collect()}
    assert {r["media_id"]: bytes(r["data"]) for r in rows} == again
    # composes with feature extraction (schema preserved)
    feats = mm.extract_features(out, decoder="fake").collect()
    assert all(f.n_bytes == 32 for f in feats)


def test_resize_unknown_resizer_raises(media):
    with pytest.raises(NotImplementedError):
        mm.resize_media(media, 4, 4, resizer="bicubic")


def test_wav_decode_and_features_are_honest():
    import numpy as np

    clip = mm.synth_wav(freq=440.0, seconds=0.5, sr=8000, amp=0.5)
    x, sr = mm.decode_wav(clip)
    assert sr == 8000 and len(x) == 4000
    f = mm._wav_features(clip)
    assert len(f) == mm.FEATURE_DIM
    dur, log_sr, rms, peak, zcr, centroid = f[:6]
    assert abs(dur - np.log1p(0.5)) < 1e-6
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01   # sine RMS = amp/sqrt(2)
    assert abs(peak - 0.5) < 0.01
    assert abs(centroid - 440.0 / 4000.0) < 0.02  # energy sits at 440 Hz
    # band energies localize: a 2 kHz tone lights a different band
    f2 = mm._wav_features(mm.synth_wav(freq=2000.0, seconds=0.5, sr=8000))
    b1, b2 = np.argmax(f[6:]), np.argmax(f2[6:])
    assert b1 != b2


def test_ppm_decode_resize_features_roundtrip():
    import numpy as np

    img_bytes = mm.synth_ppm(32, 16)
    img = mm.decode_ppm(img_bytes)
    assert img.shape == (16, 32, 3)
    assert img[0, 0, 0] == 0 and img[0, 31, 0] == 255  # R gradient

    # real nearest-neighbor resize re-encodes valid P6
    small = mm._ppm_resize(img_bytes, 8, 4)
    simg = mm.decode_ppm(small)
    assert simg.shape == (4, 8, 3)
    # every resized pixel is an actual source pixel
    assert set(np.unique(simg)) <= set(np.unique(img))

    f = mm._ppm_features(img_bytes)
    assert len(f) == mm.FEATURE_DIM
    assert abs(f[2] - 2.0) < 1e-9          # aspect = 32/16
    assert abs(f[5] - 128 / 255) < 1e-6    # constant blue plane


def test_bmp_decode_encode_resize_roundtrip():
    import numpy as np

    # PPM gradient pixels re-encoded as BMP must decode bit-identically
    src = mm.decode_ppm(mm.synth_ppm(5, 3))  # w=5 → row stride pads 15→16
    payload = mm.encode_bmp(src)
    assert payload[:2] == b"BM"
    back = mm.decode_bmp(payload)
    assert back.shape == (3, 5, 3)
    assert np.array_equal(back, src)  # padding + BGR + bottom-up all undone

    # top-down variant (negative biHeight) decodes to the same pixels
    import struct

    neg = bytearray(payload)
    h = struct.unpack_from("<i", neg, 22)[0]
    struct.pack_into("<i", neg, 22, -h)
    # with top-down flag set the stored rows are read in natural order,
    # so the image flips vs the bottom-up original
    flipped = mm.decode_bmp(bytes(neg))
    assert np.array_equal(flipped, src[::-1])

    # resize: every pixel an actual source pixel; round-trips decode_bmp
    big = mm.encode_bmp(mm.decode_ppm(mm.synth_ppm(32, 16)))
    small = mm._bmp_resize(big, 8, 4)
    simg = mm.decode_bmp(small)
    assert simg.shape == (4, 8, 3)
    assert set(np.unique(simg)) <= set(np.unique(mm.decode_bmp(big)))

    # features match the PPM features for identical pixels (shared path)
    assert mm._bmp_features(big) == mm._ppm_features(mm.synth_ppm(32, 16))

    # wrong magic / compressed files refuse loudly
    import pytest

    with pytest.raises(ValueError, match="not a BMP"):
        mm.decode_bmp(b"PNG...")
    comp = bytearray(payload)
    struct.pack_into("<I", comp, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        mm.decode_bmp(bytes(comp))


def test_bmp_malformed_payloads_raise_valueerror_only():
    """Corpus robustness contract (same as PNG): ANY malformed BMP
    refuses with ValueError — never a raw struct.error that a caller
    matching ValueError would miss mid-stage."""
    import struct

    import pytest

    payload = mm.encode_bmp(mm.decode_ppm(mm.synth_ppm(32, 16)))

    # truncated header: 'BM' magic present but the DIB fields missing →
    # struct.unpack_from at offsets 10/18/28/30 must surface ValueError
    for cut in (2, 8, 16, 24, 31):
        with pytest.raises(ValueError):
            mm.decode_bmp(payload[:cut])
    # truncated pixel data (header intact, rows missing)
    with pytest.raises(ValueError):
        mm.decode_bmp(payload[:60])
    # data offset pointing past the end of the payload
    bad_off = bytearray(payload)
    struct.pack_into("<I", bad_off, 10, len(payload) + 100)
    with pytest.raises(ValueError, match="past end"):
        mm.decode_bmp(bytes(bad_off))
    # absurd dimensions (zero-height / negative-width headers)
    for w, h in ((0, 16), (-5, 16), (32, 0)):
        bad_dim = bytearray(payload)
        struct.pack_into("<ii", bad_dim, 18, w, h)
        with pytest.raises(ValueError):
            mm.decode_bmp(bytes(bad_dim))


def test_sniff_and_auto_decoder_dispatch(spark):
    """Mixed-format corpus through ONE extract_features call: magic
    bytes route each payload to its codec; unknown bytes quarantine."""
    ppm = mm.synth_ppm(16, 8)
    img = mm.decode_ppm(ppm)
    rows = [
        ("jpg", "image", bytearray(mm.encode_jpeg(img)), {}),
        ("jpr", "image", bytearray(mm.encode_jpeg(img, progressive=True)), {}),
        ("png", "image", bytearray(mm.encode_png(img)), {}),
        ("gif", "video", bytearray(mm.synth_gif(3, 16, 8)), {}),
        ("bmp", "image", bytearray(mm.encode_bmp(img)), {}),
        ("ppm", "image", bytearray(ppm), {}),
        ("wav", "audio", bytearray(mm.synth_wav()), {}),
        ("mys", "image", bytearray(b"\x00\x01mystery-format"), {}),
    ]
    assert mm.sniff_media_type(bytes(rows[0][2])) == "jpeg"
    assert mm.sniff_media_type(bytes(rows[3][2])) == "gif"
    assert mm.sniff_media_type(b"") is None

    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r.media_id: r
        for r in mm.extract_features(
            df, decoder="auto", on_error="quarantine"
        ).collect()
    }
    assert len(out) == 8
    for mid in ("jpg", "jpr", "png", "gif", "bmp", "ppm", "wav"):
        assert out[mid].decode_error is None, mid
        assert out[mid].features != [0.0] * mm.FEATURE_DIM, mid
    assert "unrecognized media payload" in out["mys"].decode_error
    # baseline and progressive JPEG produce identical features (same
    # coefficients, different entropy layer)
    assert out["jpg"].features == out["jpr"].features
    # image formats of the same pixels agree on the pixel features
    assert out["png"].features == out["bmp"].features == out["ppm"].features


def test_extract_features_quarantine_mode(spark):
    """One corrupt payload among good ones: on_error='fail' kills the
    stage (curated-input contract); on_error='quarantine' keeps every
    row flowing with the error recorded and filterable."""
    import pytest
    from py4j.protocol import Py4JJavaError

    good = mm.encode_bmp(mm.decode_ppm(mm.synth_ppm(16, 8)))
    rows = [
        ("ok1", "image", bytearray(good), {}),
        ("bad", "image", bytearray(good[:20]), {}),  # truncated header
        ("ok2", "image", bytearray(good), {}),
        ("nul", "image", None, {}),  # NULL stays a zero-feature row
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    with pytest.raises(Exception) as exc_info:
        mm.extract_features(df, decoder="bmp").collect()
    assert "malformed BMP" in str(exc_info.value)

    out = {r.media_id: r for r in
           mm.extract_features(df, decoder="bmp", on_error="quarantine").collect()}
    assert len(out) == 4
    assert out["bad"].decode_error and "BMP" in out["bad"].decode_error
    assert out["bad"].features == [0.0] * mm.FEATURE_DIM
    assert out["ok1"].decode_error is None
    assert out["ok1"].features == out["ok2"].features != [0.0] * mm.FEATURE_DIM
    assert out["nul"].decode_error is None  # NULL is absent, not corrupt

    with pytest.raises(ValueError, match="on_error"):
        mm.extract_features(df, decoder="bmp", on_error="skip")


def test_bmp_decoder_through_dataframe_api(spark):
    imgs = spark.createDataFrame(
        [
            (
                "i",
                "image",
                mm.encode_bmp(mm.decode_ppm(mm.synth_ppm(32, 16))),
                None,
            )
        ],
        mm.MEDIA_SCHEMA,
    )
    resized = mm.resize_media(imgs, 8, 4, resizer="bmp")
    row = resized.collect()[0]
    assert mm.decode_bmp(bytes(row.data)).shape == (4, 8, 3)
    feats = mm.extract_features(resized, decoder="bmp").collect()[0]
    assert len(feats.features) == mm.FEATURE_DIM


def test_real_decoders_through_dataframe_api(spark):
    rows = [
        ("a", "audio", mm.synth_wav(freq=440.0), None),
        ("b", "audio", mm.synth_wav(freq=1800.0), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r.features
           for r in mm.extract_features(df, decoder="wav").collect()}
    assert len(out) == 2 and len(out["a"]) == mm.FEATURE_DIM
    assert out["a"] != out["b"]  # different tones → different spectra

    imgs = spark.createDataFrame(
        [("i", "image", mm.synth_ppm(32, 16), None)], mm.MEDIA_SCHEMA
    )
    resized = mm.resize_media(imgs, 8, 4, resizer="ppm")
    row = resized.collect()[0]
    assert row.meta["out_w"] == "8" and row.meta["out_h"] == "4"
    assert mm.decode_ppm(bytes(row.data)).shape == (4, 8, 3)
    feats = mm.extract_features(resized, decoder="ppm").collect()[0]
    assert len(feats.features) == mm.FEATURE_DIM


def test_real_decoders_tolerate_null_and_crlf(spark):
    # NULL payloads yield zero features, not a stage failure
    df = spark.createDataFrame(
        [("n", "audio", None, None)], mm.MEDIA_SCHEMA
    )
    row = mm.extract_features(df, decoder="wav").collect()[0]
    assert row.features == [0.0] * mm.FEATURE_DIM and row.n_bytes == 0
    rowp = mm.extract_features(df, decoder="ppm").collect()[0]
    assert rowp.features == [0.0] * mm.FEATURE_DIM
    assert mm._ppm_resize(b"", 4, 4) == b""
    # a 1-frame WAV must not emit NaN features
    one = mm.synth_wav(freq=100.0, seconds=1.0 / 8000, sr=8000)
    feats = mm._wav_features(one)
    assert all(f == f for f in feats)  # no NaN
    # CRLF-terminated header decodes pixel-exact, not byte-shifted
    img = mm.decode_ppm(mm.synth_ppm(8, 4))
    crlf = b"P6\r\n8 4\r\n255\r\n" + img.tobytes()
    assert (mm.decode_ppm(crlf) == img).all()


def _png_filter_rows(img, ftype):
    """Independent reference implementation of RFC 2083 §6 filters
    (ENCODER side), used to build test files the decoder must invert."""
    import numpy as np

    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(int)
    out = []
    for y in range(h):
        orig = flat[y]
        prior = flat[y - 1] if y else [0] * stride
        row = bytearray([ftype])
        for x in range(stride):
            left = orig[x - c] if x >= c else 0
            up = prior[x]
            upleft = flat[y - 1][x - c] if (y and x >= c) else 0
            if ftype == 0:
                v = orig[x]
            elif ftype == 1:
                v = orig[x] - left
            elif ftype == 2:
                v = orig[x] - up
            elif ftype == 3:
                v = orig[x] - ((left + up) // 2)
            else:  # Paeth
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                pred = (
                    left
                    if (pa <= pb and pa <= pc)
                    else (up if pb <= pc else upleft)
                )
                v = orig[x] - pred
            row.append(v & 0xFF)
        out.append(bytes(row))
    return b"".join(out)


def _png_chunk(t, d):
    import struct
    import zlib

    return (
        struct.pack(">I", len(d))
        + t
        + d
        + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    )


def _png_manual(img, ftype):
    """Assemble a PNG by hand with every row filtered as `ftype`."""
    import struct
    import zlib

    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(_png_filter_rows(img, ftype)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_all_five_filters_reconstruct_exactly():
    """Each spec filter applied by an INDEPENDENT reference encoder must
    invert to the original pixels — this pins the decoder to RFC 2083,
    not merely to our own encoder's conventions."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    for ftype in range(5):
        got = mm.decode_png(_png_manual(img, ftype))
        assert np.array_equal(got, img), f"filter {ftype} failed"


def test_png_roundtrip_gray_rgb_rgba_and_refusals():
    import numpy as np
    import pytest

    rng = np.random.default_rng(4)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, size=(4, 6, c), dtype=np.uint8)
        back = mm.decode_png(mm.encode_png(img))
        assert np.array_equal(back, img)

    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"JFIF....")
    # 16-bit refuses loudly
    img = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    payload = bytearray(mm.encode_png(img))
    payload[24] = 16  # IHDR bit depth byte
    # (crc now wrong too, but depth check fires first)
    with pytest.raises(ValueError, match="unsupported PNG"):
        mm.decode_png(bytes(payload))


def test_png_palette_expands_to_rgb():
    import struct
    import zlib

    # 2x2 palette image: indices [[0,1],[1,0]], palette red/blue
    idx = b"\x00\x00\x01" + b"\x00\x01\x00"  # two filter-0 rows
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255]))
        + _png_chunk(b"IDAT", zlib.compress(idx))
        + _png_chunk(b"IEND", b"")
    )
    img = mm.decode_png(payload)
    assert img.shape == (2, 2, 3)
    assert list(img[0, 0]) == [255, 0, 0] and list(img[0, 1]) == [0, 0, 255]
    assert list(img[1, 0]) == [0, 0, 255] and list(img[1, 1]) == [255, 0, 0]


def test_png_decoder_through_dataframe_api(spark):
    import numpy as np

    src = mm.decode_ppm(mm.synth_ppm(32, 16))
    imgs = spark.createDataFrame(
        [("p", "image", mm.encode_png(src), None)], mm.MEDIA_SCHEMA
    )
    resized = mm.resize_media(imgs, 8, 4, resizer="png")
    row = resized.collect()[0]
    simg = mm.decode_png(bytes(row.data))
    assert simg.shape == (4, 8, 3)
    feats = mm.extract_features(resized, decoder="png").collect()[0]
    assert len(feats.features) == mm.FEATURE_DIM
    # identical pixels → identical features across PPM/BMP/PNG decoders
    assert (
        mm._png_features(mm.encode_png(src))
        == mm._ppm_features(mm.synth_ppm(32, 16))
    )


def test_png_malformed_payloads_raise_valueerror_only():
    """Corpus robustness contract: ANY malformed PNG refuses with
    ValueError — never a raw zlib.error / struct.error / IndexError
    that a caller matching ValueError would miss mid-stage."""
    import struct
    import zlib
    import numpy as np
    import pytest

    good = mm.encode_png(
        np.zeros((2, 2, 3), dtype=np.uint8)
    )
    # truncated mid-IDAT → corrupt deflate stream
    with pytest.raises(ValueError, match="malformed PNG"):
        mm.decode_png(good[:-20] )
    # IHDR shorter than its declared struct
    tiny = b"\x89PNG\r\n\x1a\n" + struct.pack(">I4s", 13, b"IHDR") + b"\x00\x00"
    with pytest.raises(ValueError):
        mm.decode_png(tiny)
    # palette index past PLTE
    idx = b"\x00\x05"  # one row, index 5 into a 1-entry palette
    bad_pal = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", bytes([1, 2, 3]))
        + _png_chunk(b"IDAT", zlib.compress(idx))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        mm.decode_png(bad_pal)
    # non-uint8 encode refuses instead of silently truncating mod 256
    with pytest.raises(ValueError, match="uint8"):
        mm.encode_png(np.full((1, 1, 3), 300, dtype=np.int32))
    with pytest.raises(ValueError, match="uint8"):
        mm.encode_bmp(np.full((1, 1, 3), 300, dtype=np.int32))
    with pytest.raises(ValueError, match="channel count"):
        mm.encode_png(np.zeros((2, 2, 2), dtype=np.uint8))
