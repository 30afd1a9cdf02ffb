"""PCM audio transforms: container round-trips (WAV and FLAC through
the SAME transform), mono downmix, linear resample, silence trim,
quarantine composition with features/probe — the audio counterpart of
the resize_media contract."""

import numpy as np
import pytest

from vectra_py_spark.operators import multimodal as mm
from vectra_py_spark.operators.audio import (
    decode_audio_payload,
    encode_audio_payload,
    transform_audio,
)
from vectra_py_spark.operators.flac import encode_flac
from vectra_py_spark.operators.probe import probe_payload


def _stereo(n=800, sr=8000) -> np.ndarray:
    t = np.arange(n)
    return np.stack(
        [(6000 * np.sin(t / 7)).astype(np.int64),
         (3000 * np.sin(t / 3)).astype(np.int64)], axis=1
    )


def test_decode_encode_roundtrip_both_containers():
    s = _stereo()
    for kind in ("wav", "flac"):
        p = encode_audio_payload(s, 8000, kind)
        got, sr, k = decode_audio_payload(p)
        assert (sr, k) == (8000, kind)
        assert np.array_equal(got, s)
    with pytest.raises(ValueError, match="unsupported audio container"):
        decode_audio_payload(b"OggS....")


def test_mono_resample_trim_semantics(spark):
    s = _stereo(800, 8000)
    # pad with digital silence on both ends
    padded = np.concatenate(
        [np.zeros((100, 2), np.int64), s, np.zeros((50, 2), np.int64)]
    )
    rows = [
        ("w", "audio", bytearray(encode_audio_payload(padded, 8000, "wav")), {}),
        ("f", "audio", bytearray(encode_flac(padded, 8000)), {}),
        ("bad", "audio", bytearray(b"JUNKJUNKJUNK"), {}),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = transform_audio(
        df, mono=True, target_sr=4000, trim_db=-60.0, on_error="quarantine"
    )
    got = {r.media_id: r for r in out.collect()}
    # quarantined row: NULL payload + error in meta
    assert got["bad"].data is None
    assert "unsupported audio container" in got["bad"].meta["audio_error"]
    # the two containers carry the SAME PCM → identical transformed PCM
    pw, sw, kw = decode_audio_payload(bytes(got["w"].data))
    pf, sf, kf = decode_audio_payload(bytes(got["f"].data))
    assert (sw, kw) == (4000, "wav") and (sf, kf) == (4000, "flac")
    assert np.array_equal(pw, pf)
    assert pw.shape[1] == 1  # mono
    assert got["w"].meta["out_sr"] == "4000"
    assert got["w"].meta["out_ch"] == "1"
    # trim happened: resampled length well under the padded length / 2
    n_out = int(got["w"].meta["out_samples"])
    assert n_out < (padded.shape[0] // 2) * 1.02
    # downstream composition: features + probe still work on the output
    assert probe_payload(bytes(got["f"].data))["sample_rate"] == 4000
    feats = mm.DECODERS["auto"](bytes(got["w"].data))
    assert any(v != 0.0 for v in feats)


def test_resample_identity_and_lengths():
    s = _stereo(1000, 8000)
    p = encode_audio_payload(s, 8000, "wav")
    # same-rate resample is a no-op
    got, sr, _ = decode_audio_payload(p)
    assert np.array_equal(got, s)
    # 2x up then inspect length
    from vectra_py_spark.operators.audio import _apply

    up, sr_up = _apply(s, 8000, False, 16000, None)
    assert sr_up == 16000 and up.shape == (2000, 2)
    # endpoints preserved by the interpolation grid
    assert up[0, 0] == s[0, 0] and up[-1, 0] == s[-1, 0]
    down, sr_dn = _apply(s, 8000, False, 2000, None)
    assert sr_dn == 2000 and down.shape == (250, 2)


def test_trim_all_silence_collapses_to_one_sample():
    from vectra_py_spark.operators.audio import _apply

    s = np.zeros((500, 2), np.int64)
    out, sr = _apply(s, 8000, False, None, -60.0)
    assert out.shape == (1, 2) and sr == 8000
    # encodable in both containers
    for kind in ("wav", "flac"):
        assert decode_audio_payload(encode_audio_payload(out, sr, kind))[0].shape[0] == 1


def test_transform_validation(spark):
    df = spark.createDataFrame(
        [("a", "audio", bytearray(mm.synth_wav()), {})], mm.MEDIA_SCHEMA
    )
    with pytest.raises(ValueError, match="no transform requested"):
        transform_audio(df)
    with pytest.raises(ValueError, match="target sample rate"):
        transform_audio(df, target_sr=0)
    with pytest.raises(ValueError, match="on_error"):
        transform_audio(df, mono=True, on_error="ignore")
