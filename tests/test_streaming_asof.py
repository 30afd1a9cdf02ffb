"""Streaming as-of enrichment (`vectra_py_spark.streaming.asof`):
watermark-correct buffered replay must match the batch as-of join on
the same data, including out-of-order arrivals and timestamp ties.

All event times respect the watermark contract (no row is ever later
than max_event_time − delay when it lands), so the result is
deterministic regardless of how the engine slices the two file sources
into micro-batches.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

from vectra_py_spark.operators.asof import asof_join
from vectra_py_spark.streaming.asof import streaming_asof_enrich

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier

L_SCHEMA = "user_id string, event_time timestamp, event_id string"
R_SCHEMA = "user_id string, event_time timestamp, value double"

LEFTS = [
    ("k1", 8, "L0"),   # before any right -> (None, None)
    ("k1", 15, "L1"),  # -> right@10 (1.0)
    ("k1", 28, "L4"),  # -> out-of-order right@25 (7.0)
    ("k1", 30, "L2"),  # tie with right@30 -> inclusive (2.0)
    ("k2", 50, "L3"),  # -> right@5 (5.0)
]
RIGHTS = [
    ("k1", 10, 1.0),
    ("k2", 5, 5.0),
    ("k1", 30, 2.0),
    ("k1", 25, 7.0),  # arrives in batch 2, AFTER batch 1's max event 15
]


def _t(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_streaming_asof_matches_batch(spark, tmp_path):
    lsrc, rsrc, ckpt = tmp_path / "l", tmp_path / "r", tmp_path / "ck"
    lsrc.mkdir(), rsrc.mkdir()

    def write(df_rows, schema, dest):
        rows = [
            (k, _t(s), x) for k, s, x in df_rows
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(dest))

    # batch 1
    write(LEFTS[:2], L_SCHEMA, lsrc)
    write(RIGHTS[:2], R_SCHEMA, rsrc)

    left = spark.readStream.schema(L_SCHEMA).parquet(str(lsrc))
    right = spark.readStream.schema(R_SCHEMA).parquet(str(rsrc))
    q = (
        # 30s delay covers every cross-batch/cross-source skew below
        streaming_asof_enrich(left, right, watermark="30 seconds")
        .writeStream.format("memory")
        .queryName("asof_out")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()

        # batch 2: late-but-inside-watermark right@25, tie at 30
        write(LEFTS[2:], L_SCHEMA, lsrc)
        write(RIGHTS[2:], R_SCHEMA, rsrc)
        time.sleep(0.2)
        q.processAllAvailable()

        # sentinel batches advance the watermark past every real row
        for s in (120, 160):
            write([("k3", s, f"S{s}")], L_SCHEMA, lsrc)
            time.sleep(0.2)
            q.processAllAvailable()

        got = {
            r.left_id: (r.asof_ms, r.asof_value)
            for r in spark.sql(
                "SELECT * FROM asof_out WHERE key != 'k3'"
            ).collect()
        }
    finally:
        q.stop()

    # batch oracle on the same rows (ms domain)
    lall = spark.createDataFrame(
        [(k, _t(s), i) for k, s, i in LEFTS], L_SCHEMA
    ).select("user_id", F.unix_millis("event_time").alias("ms"), "event_id")
    rall = spark.createDataFrame(
        [(k, _t(s), v) for k, s, v in RIGHTS], R_SCHEMA
    ).select("user_id", F.unix_millis("event_time").alias("ms"), "value")
    expected = {
        r.event_id: (r.asof_ms, r.asof_value)
        for r in asof_join(
            lall, rall, key="user_id", ts="ms", right_cols=("value",)
        ).collect()
    }

    assert set(got) == {"L0", "L1", "L2", "L3", "L4"}
    assert got == expected
    # spot semantics: inclusive tie, out-of-order right, no-right null
    assert got["L2"][1] == 2.0
    assert got["L4"][1] == 7.0
    assert got["L0"] == (None, None)
