"""Stream-stream interval join (`vectra_py_spark.streaming.joins`):
a file-source two-stream run must match the equivalent batch range
join, and the plan must carry watermarks on both sides."""

from __future__ import annotations

import json
import tempfile
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectra_py_spark.streaming.joins import streaming_interval_join
import pytest

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(s: int) -> str:
    return datetime.fromtimestamp(s, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.000Z"
    )


def _write(dirname: str, name: str, rows: list[tuple[int, int, float]]) -> None:
    Path(dirname, name).write_text(
        "\n".join(
            json.dumps(
                {"user_id": u, "event_time": _ts(t), "value": v}
            )
            for u, t, v in rows
        )
    )


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_streaming_interval_join_matches_batch(spark):
    base = tempfile.mkdtemp()
    ldir, rdir, out = f"{base}/l", f"{base}/r", f"{base}/out"
    Path(ldir).mkdir(), Path(rdir).mkdir()
    t0 = 1_700_000_000
    lrows = [(1, t0, 0.0), (1, t0 + 100, 0.0), (2, t0, 0.0)]
    rrows = [
        (1, t0 + 5, 1.0),     # in window of left#1
        (1, t0 + 59, 2.0),    # in window (width 60)
        (1, t0 + 60, 4.0),    # boundary: excluded
        (1, t0 + 105, 8.0),   # in window of left#2
        (2, t0 - 1, 16.0),    # before left: excluded
        (3, t0, 32.0),        # wrong key
    ]
    _write(ldir, "l0.json", lrows)
    _write(rdir, "r0.json", rrows)

    lstream = spark.readStream.schema(SCHEMA).json(ldir)
    rstream = spark.readStream.schema(SCHEMA).json(rdir)
    joined = streaming_interval_join(lstream, rstream, width_seconds=60)
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], int(r["l_time"].timestamp()), r["r_value"])
        for r in spark.table("ivj").collect()
    }
    assert got == {
        (1, t0, 1.0),
        (1, t0, 2.0),
        (1, t0 + 100, 8.0),
    }


def test_streaming_interval_join_plan_has_two_watermarks(spark):
    base = tempfile.mkdtemp()
    ldir, rdir = f"{base}/l", f"{base}/r"
    Path(ldir).mkdir(), Path(rdir).mkdir()
    lstream = spark.readStream.schema(SCHEMA).json(ldir)
    rstream = spark.readStream.schema(SCHEMA).json(rdir)
    plan = streaming_interval_join(
        lstream, rstream, width_seconds=60
    )._jdf.queryExecution().logical().toString()
    assert plan.count("EventTimeWatermark") == 2, plan
