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
