"""WebDataset shard export (`operators/webdataset.py`): canonical TAR
bytes, sample adjacency and ordering, deterministic sharding, NULL
parts, duplicate-key refusal, and the round trip through this repo's
OWN archive reader."""

import io
import os
import tarfile
import tempfile

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.webdataset import (
    synth_webdataset,
    to_webdataset_shards,
)

SCHEMA = "key STRING, image BINARY, caption STRING"


def _rows(n):
    return [
        (f"s{i:04d}", bytes([i % 256]) * (i % 7 + 1), f"caption {i}")
        for i in range(n)
    ]


def test_synth_layout_and_determinism():
    samples = [
        ("b", {"txt": "second", "jpg": b"\x01\x02"}),
        ("a", {"txt": "first"}),
    ]
    payload = synth_webdataset(samples)
    with tarfile.open(fileobj=io.BytesIO(payload)) as t:
        names = t.getnames()
        # order given is preserved; within a sample, exts sorted —
        # each sample's members ADJACENT (the WebDataset contract)
        assert names == ["b.jpg", "b.txt", "a.txt"]
        assert t.extractfile("b.jpg").read() == b"\x01\x02"
        assert t.extractfile("a.txt").read() == b"first"
        info = t.getmember("b.txt")
        assert (info.mtime, info.uid, info.gid, info.mode) == (0, 0, 0, 0o644)
    assert synth_webdataset(samples) == payload  # byte-identical rerun


def test_synth_rejects_empty_sample():
    with pytest.raises(ValueError, match="no parts"):
        synth_webdataset([("k", {})])


def test_shards_deterministic_and_complete(spark):
    df = spark.createDataFrame(_rows(200), SCHEMA)
    out = to_webdataset_shards(
        df, {"jpg": "image", "txt": "caption"}, n_shards=8
    )
    a = {r.shard: (bytes(r.payload), r.n_samples) for r in out.collect()}
    b = {r.shard: (bytes(r.payload), r.n_samples) for r in out.collect()}
    assert a == b  # rerun → identical membership AND identical bytes
    assert sum(n for _, n in a.values()) == 200
    # every sample key present exactly once across shards, keys sorted
    # within each shard, members adjacent
    seen = []
    for payload, _n in a.values():
        with tarfile.open(fileobj=io.BytesIO(payload)) as t:
            names = t.getnames()
        keys = [n[:-4] for n in names[::2]]
        assert names == [x for k in keys for x in (f"{k}.jpg", f"{k}.txt")]
        assert keys == sorted(keys)
        seen += keys
    assert sorted(seen) == [f"s{i:04d}" for i in range(200)]


def test_null_part_omitted(spark):
    df = spark.createDataFrame(
        [("k1", b"\x05", "has both"), ("k2", None, "caption only")],
        SCHEMA,
    )
    (r,) = to_webdataset_shards(
        df, {"jpg": "image", "txt": "caption"}, n_shards=1
    ).collect()
    with tarfile.open(fileobj=io.BytesIO(bytes(r.payload))) as t:
        assert t.getnames() == ["k1.jpg", "k1.txt", "k2.txt"]
    assert r.n_samples == 2


def test_duplicate_key_refuses(spark):
    df = spark.createDataFrame(
        [("dup", b"\x01", "a"), ("dup", b"\x02", "b")], SCHEMA
    )
    out = to_webdataset_shards(df, {"jpg": "image"}, n_shards=1)
    with pytest.raises(Exception, match="duplicate sample key"):
        out.collect()


def test_validation():
    # arg validation fires before any Spark work
    with pytest.raises(ValueError, match="n_shards"):
        to_webdataset_shards(None, {"jpg": "image"}, n_shards=0)
    with pytest.raises(ValueError, match="at least one part"):
        to_webdataset_shards(None, {}, n_shards=4)
    # forgotten sizing is refused, not defaulted (a fixed default
    # count at corpus scale = unbounded per-task TAR builds)
    with pytest.raises(ValueError, match="size the export"):
        to_webdataset_shards(None, {"jpg": "image"})
    with pytest.raises(ValueError, match="max_samples_per_shard"):
        to_webdataset_shards(
            None, {"jpg": "image"}, max_samples_per_shard=0
        )
    with pytest.raises(ValueError, match="max_shard_bytes"):
        to_webdataset_shards(None, {"jpg": "image"}, max_shard_bytes=512)
    # the sample key cannot double as a payload column (pandas would
    # see duplicate column names and pack str(Series) garbage)
    with pytest.raises(ValueError, match="key_col"):
        to_webdataset_shards(
            None, {"txt": "key"}, n_shards=4, key_col="key"
        )


def test_max_samples_per_shard_bounds_and_derives_count(spark):
    """img2dataset-convention sizing: shard count derives from the
    data, every shard holds <= the bound, nothing is lost, and reruns
    are byte-identical."""
    df = spark.createDataFrame(_rows(200), SCHEMA)
    out = to_webdataset_shards(
        df, {"jpg": "image", "txt": "caption"},
        max_samples_per_shard=16,
    )
    rows = out.collect()
    assert all(r.n_samples <= 16 for r in rows)
    assert sum(r.n_samples for r in rows) == 200
    # derived count: ceil(200/16)=13 base buckets, splits only on skew
    assert len({r.shard for r in rows}) == 13
    again = {(r.shard, r.subshard): bytes(r.payload) for r in out.collect()}
    assert again == {(r.shard, r.subshard): bytes(r.payload) for r in rows}
    # every key back exactly once across all (shard, subshard) TARs
    seen = []
    for r in rows:
        with tarfile.open(fileobj=io.BytesIO(bytes(r.payload))) as t:
            seen += [n[:-4] for n in t.getnames()[::2]]
    assert sorted(seen) == [f"s{i:04d}" for i in range(200)]


def test_max_shard_bytes_bounds_real_payload_length(spark):
    """max_shard_bytes bounds the FINISHED TAR length (headers,
    padding, EOF record included), with an oversized single sample
    getting a subshard of its own rather than vanishing."""
    rows = [(f"k{i:03d}", bytes([i]) * 3000, f"c{i}") for i in range(40)]
    rows.append(("zbig", b"\xff" * 50_000, "big"))  # > the bound alone
    df = spark.createDataFrame(rows, SCHEMA)
    bound = 20_480  # two TAR records
    out = to_webdataset_shards(
        df, {"jpg": "image", "txt": "caption"},
        n_shards=2, max_shard_bytes=bound,
    ).collect()
    big = [r for r in out if b"\xff" * 50_000 in bytes(r.payload)]
    assert len(big) == 1 and big[0].n_samples == 1  # isolated, kept
    for r in out:
        if r is not big[0]:
            assert len(bytes(r.payload)) <= bound, len(bytes(r.payload))
    assert sum(r.n_samples for r in out) == 41


def test_integer_keys_sort_as_emitted_names(spark):
    """Keys are stringified BEFORE the shard sort, so member order is
    the bytewise order of the emitted names (canonical-bytes contract)
    even for non-string key columns: 10 < 2 bytewise."""
    df = spark.createDataFrame(
        [(2, b"\x02"), (10, b"\x0a"), (1, b"\x01")],
        "key INT, image BINARY",
    )
    (r,) = to_webdataset_shards(
        df, {"jpg": "image"}, n_shards=1, key_col="key"
    ).collect()
    with tarfile.open(fileobj=io.BytesIO(bytes(r.payload))) as t:
        assert t.getnames() == ["1.jpg", "10.jpg", "2.jpg"]


def test_roundtrip_through_repo_archive_reader(spark):
    """The closing loop: shards written to disk come back through
    read_media_archive with every member intact — pack with this
    repo, ingest with this repo."""
    from vectra_py_spark.sources.warc import read_media_archive

    df = spark.createDataFrame(_rows(40), SCHEMA)
    shards = to_webdataset_shards(
        df, {"jpg": "image", "txt": "caption"}, n_shards=4
    ).collect()
    d = tempfile.mkdtemp()
    for r in shards:
        with open(os.path.join(d, f"shard-{r.shard:05d}.tar"), "wb") as f:
            f.write(bytes(r.payload))
    members = read_media_archive(spark, d)
    assert members.where(F.col("error").isNotNull()).count() == 0
    caps = {
        r.member: bytes(r.payload).decode()
        for r in members.collect() if r.member.endswith(".txt")
    }
    assert caps == {f"s{i:04d}.txt": f"caption {i}" for i in range(40)}
    imgs = members.where(F.col("member").endswith(".jpg")).count()
    assert imgs == 40
