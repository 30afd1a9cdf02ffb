"""Stream-stream interval join: the streaming twin of
:func:`~vectra_py_spark.operators.asof.range_join_bucketed`.

Batch range joins see all data; a stream-stream join must bound how
long each side's rows wait for matches, or state grows forever.
Structured Streaming does this with watermarks on BOTH sides plus a
time-range join condition — Spark derives the state eviction horizon
from the two (rows older than watermark + interval drop out of the
join state). This is the Flink interval-join semantic expressed in
Spark's declarative form.

100 TB notes: state is hash-partitioned on the join key across
executors; per-key state is bounded by (interval + watermark delay) ×
event rate. The watermark delay is the latency/completeness dial: a
larger delay admits later events at the cost of state size. The same
code shape serves clicks↔purchases attribution, error-burst
correlation, and feature-join-at-serve-time pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_interval_join"]


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    width_seconds: int,
    key: str = "user_id",
    ts: str = "event_time",
    watermark: str = "10 seconds",
    right_value: str = "value",
) -> DataFrame:
    """Join right rows landing in ``[left.ts, left.ts + width)`` per key.

    Both inputs are streaming DataFrames with an ``event_time``
    timestamp column. Output columns: left's key/ts plus the matched
    right timestamp and value (inner join — unmatched left rows need a
    separate outer pass, which Spark supports with the same condition).
    """
    l = (
        left.withWatermark(ts, watermark)
        .select(
            F.col(key).alias("l_key"),
            F.col(ts).alias("l_time"),
        )
    )
    r = (
        right.withWatermark(ts, watermark)
        .select(
            F.col(key).alias("r_key"),
            F.col(ts).alias("r_time"),
            F.col(right_value).alias("r_value"),
        )
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_time") >= F.col("l_time"))
        & (
            F.col("r_time")
            < F.col("l_time") + F.expr(f"INTERVAL {width_seconds} SECONDS")
        ),
        "inner",
    ).select(
        F.col("l_key").alias(key),
        F.col("l_time"),
        F.col("r_time"),
        F.col("r_value"),
    )
