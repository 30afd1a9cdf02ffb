"""Header-only media triage: probe_payload parity with the full
decoders across all ten formats, MP3 frame-chain statistics (the one
format whose decode stays gated), the probe_media quarantine contract,
and fuzz-hardening of the probe path."""

import numpy as np
import pytest

from vectra_py_spark.operators import multimodal as mm
from vectra_py_spark.operators.avi import synth_avi
from vectra_py_spark.operators.flac import synth_flac
from vectra_py_spark.operators.mp3 import mp3_info, synth_mp3
from vectra_py_spark.operators.mp4 import synth_mp4
from vectra_py_spark.operators.probe import probe_media, probe_payload


def _cases() -> dict[str, bytes]:
    img = mm.decode_ppm(mm.synth_ppm(24, 16))
    return {
        "jpeg": mm.encode_jpeg(img),
        "jpeg_prog": mm.encode_jpeg(img, progressive=True),
        "png": mm.encode_png(img),
        "gif": mm.synth_gif(3, 24, 16),
        "bmp": mm.encode_bmp(img),
        "ppm": mm.synth_ppm(24, 16),
        "wav": mm.synth_wav(),
        "avi": synth_avi(4, 24, 16),
        "flac": synth_flac(),
        "mp4": synth_mp4(5, 24, 16),
        "mp3": synth_mp3(20),
    }


def test_probe_matches_decoders():
    """Probe metadata agrees with what the full decoders actually
    produce — dims, frame counts, durations."""
    cases = _cases()
    for k in ("jpeg", "jpeg_prog", "png", "bmp", "ppm"):
        info = probe_payload(cases[k])
        assert (info["width"], info["height"], info["n_frames"]) == (24, 16, 1)
    g = probe_payload(cases["gif"])
    assert (g["width"], g["height"]) == (24, 16)
    assert g["n_frames"] == mm.decode_gif(cases["gif"]).shape[0] == 3
    a = probe_payload(cases["avi"])
    assert a["n_frames"] == 4 and a["kind"] == "avi"
    m = probe_payload(cases["mp4"])
    assert m["n_frames"] == 5 and m["kind"] == "mp4"
    w = probe_payload(cases["wav"])
    x, sr = mm.decode_wav(cases["wav"])
    assert w["sample_rate"] == sr and w["n_frames"] == len(x)
    f = probe_payload(cases["flac"])
    assert f["kind"] == "flac" and f["duration_s"] == pytest.approx(0.1)


def test_gif_frame_count_without_lzw_decode():
    """The GIF walker counts frames purely from block structure; parity
    with the real decoder on interlace/local-table payloads too."""
    for n in (1, 2, 6):
        p = mm.synth_gif(n, 30, 20)
        assert probe_payload(p)["n_frames"] == mm.decode_gif(p).shape[0] == n


def test_mp3_info_paths():
    info = mp3_info(synth_mp3(40, bitrate_kbps=192, sr=32000))
    assert info["sample_rate"] == 32000
    assert info["n_frames"] == 40
    assert info["cbr"] and info["bitrate_mean"] == 192000
    assert info["duration_s"] == pytest.approx(40 * 1152 / 32000)
    vbr = mp3_info(synth_mp3(40, vbr=True))
    assert not vbr["cbr"]
    # ID3v2 header + ID3v1 trailer both skipped
    body = synth_mp3(10)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + bytes(10)
    tagged = id3v2 + body + b"TAG" + bytes(125)
    assert mp3_info(tagged)["n_frames"] == 10
    for bad in (b"", b"\xff\xfb", body[:-5], b"not music at all"):
        with pytest.raises(ValueError):
            mp3_info(bad)
    # probe dispatch reaches mp3 (weakest magic, tried last)
    assert probe_payload(body)["kind"] == "mp3"
    assert probe_payload(tagged)["kind"] == "mp3"


def test_probe_fuzz_never_escapes_valueerror():
    """Same contract as the decode fuzz harness: mutations of every
    format through the probe must probe or raise ValueError only."""
    import sys

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    for kind, payload in _cases().items():
        import zlib
        rng = np.random.default_rng(zlib.crc32(kind.encode()) + 1)
        for mut in _mutations(payload, rng, 150):
            try:
                probe_payload(mut)
            except ValueError:
                pass
    # synth_mp3 guard rails
    with pytest.raises(ValueError, match="sample rate"):
        synth_mp3(5, sr=11025)


def test_probe_media_dataframe_quarantine(spark):
    cases = _cases()
    rows = [(k, "media", bytearray(p), {}) for k, p in cases.items()]
    rows.append(("junk", "media", bytearray(b"\x00\x01nothing"), {}))
    rows.append(("empty", "media", None, {}))
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r for r in probe_media(df).collect()}
    assert len(got) == len(rows)
    assert got["mp4"].kind == "mp4" and got["mp4"].n_frames == 5
    assert got["mp3"].duration_s == pytest.approx(20 * 1152 / 44100)
    assert got["flac"].sample_rate == 8000
    assert got["gif"].width == 24 and got["gif"].error is None
    assert got["junk"].kind is None and "unrecognized" in got["junk"].error
    assert got["empty"].error == "empty payload"
    assert got["jpeg"].n_bytes == len(cases["jpeg"])


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_triage_media_filters_before_decode(spark):
    """Probe-before-decode (VERDICT r7 item 5): triage_media keeps
    only probe-clean rows inside the bounds, passes the original
    columns through untouched (payloads never shuffle), and the result
    feeds extract_features directly — rejected payloads never reach a
    decoder."""
    from vectra_py_spark.operators.probe import triage_media

    cases = _cases()
    rows = [
        (k, "media", bytearray(p), {"src": k}) for k, p in cases.items()
    ]
    rows.append(("junk", "media", bytearray(b"\x00\x01nothing"), {}))
    rows.append(("empty", "media", None, {}))
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    # probe-clean only: junk/empty dropped, everything else flows
    clean = triage_media(df)
    got = {r.media_id: r for r in clean.collect()}
    assert set(got) == set(cases)
    assert got["jpeg"].kind == "jpeg"
    assert got["jpeg"].n_bytes == len(cases["jpeg"])
    assert dict(got["jpeg"].meta) == {"src": "jpeg"}  # passthrough

    # bounds: modality allowlist + byte / frame caps compose
    images = {
        r.media_id
        for r in triage_media(
            df, kinds={"jpeg", "png", "gif", "bmp", "ppm"}
        ).collect()
    }
    assert images == {"jpeg", "jpeg_prog", "png", "gif", "bmp", "ppm"}
    few_bytes = triage_media(df, max_bytes=1).count()
    assert few_bytes == 0
    single_frame = {
        r.media_id for r in triage_media(df, max_frames=1).collect()
    }
    assert "gif" not in single_frame and "mp4" not in single_frame
    assert "jpeg" in single_frame and "png" in single_frame

    # triaged rows feed the decoder with zero decode errors — routing
    # by kind is the point: probe-clean MP3/PDF go to their own stages
    # (mp3 decode is gated, pdf extracts text), everything else to the
    # feature decoder
    decodable = triage_media(
        df,
        kinds={"jpeg", "png", "gif", "bmp", "ppm", "wav", "flac",
               "avi", "mp4"},
    )
    feats = mm.extract_features(
        decodable.drop("kind", "n_bytes"), decoder="auto", on_error="fail"
    )
    assert feats.filter("features IS NULL").count() == 0
    assert feats.count() == decodable.count()
