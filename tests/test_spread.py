"""spread()'s scale guard (session.py) — VERDICT r12 item 4.

The guard must never repartition-down a table whose SCAN is already
parallel: many small files (file-count short-circuit) or few HUGE
files (split-count estimate from total bytes / maxPartitionBytes).
Driver-built and tiny one-file sources still get spread.
"""

from __future__ import annotations

import pytest

from vectra_py_spark import session as vsession
from vectra_py_spark.session import _parse_bytes, spread


def test_parse_bytes_forms():
    assert _parse_bytes("134217728b") == 134217728
    assert _parse_bytes("128m") == 128 * 1024**2
    assert _parse_bytes("128MB") == 128 * 1024**2
    assert _parse_bytes("1g") == 1024**3
    assert _parse_bytes("4096") == 4096
    assert _parse_bytes(" 512k ") == 512 * 1024


def test_spread_one_small_file_is_repartitioned(spark, tmp_path):
    p = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread(df, target=8)
    assert out is not df
    assert "RoundRobinPartitioning" in out._jdf.queryExecution().toString()


def test_spread_many_files_is_noop(spark, tmp_path):
    p = str(tmp_path / "many")
    spark.range(100).repartition(6).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= 4
    assert spread(df, target=4) is df


def test_spread_few_huge_files_is_noop(spark, tmp_path, monkeypatch):
    """40×10 GB files = thousands of scan splits but only 40 file paths:
    the guard must size the listing and leave the table alone instead of
    injecting a full round-robin shuffle capped at <= target partitions."""
    p = str(tmp_path / "huge")
    spark.range(100).repartition(2).write.parquet(p)
    df = spark.read.parquet(p)
    n_files = len(df.inputFiles())
    assert 0 < n_files < 64
    monkeypatch.setattr(
        vsession, "_input_bytes",
        lambda _spark, files: 40 * 10 * 1024**3,
    )
    # default maxPartitionBytes 128 MB -> ~3200 estimated splits >= 64
    assert spread(df, target=64) is df


def test_spread_few_small_files_still_spreads(spark, tmp_path):
    """The size estimate must not disable the local/fixture case: a
    2-file table far below maxPartitionBytes still gets spread."""
    p = str(tmp_path / "small")
    spark.range(100).repartition(2).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread(df, target=8)
    assert out is not df


def test_spread_driver_built_frame_spreads(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "x INT")
    assert spread(df, target=4) is not df


def test_input_bytes_real_listing(spark, tmp_path):
    p = str(tmp_path / "sized")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    files = df.inputFiles()
    total = vsession._input_bytes(spark, files)
    assert total > 0
    import os
    expect = sum(
        os.path.getsize(f.replace("file:", "")) for f in files
    )
    assert total == expect


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-v"]))
