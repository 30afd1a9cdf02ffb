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
