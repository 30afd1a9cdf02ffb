"""Streaming as-of enrichment — the streaming twin of
:func:`~vectra_py_spark.operators.asof.asof_join`.

Batch as-of sees all data and replays it in timestamp order. A stream
must decide WHEN a left event's enrichment is final: a right event that
is still in flight could be the true "latest at-or-before". The
watermark is exactly that decision, so this operator buffers both sides
per key in state and finalizes a left event only once the watermark
passes its timestamp — then replays the mature slice in (timestamp,
right-before-left) order, identical to the batch twin's union+window
semantics. Out-of-order arrivals inside the watermark delay are
therefore enriched *correctly*, not best-effort (the naive
"keep latest right seen so far" stream enrichment gets ties and
out-of-order rights wrong).

Lateness contract (standard watermark semantics): a right event
arriving with ``ts < watermark`` is late data and is dropped by the
engine before reaching the operator — a left event already finalized
is never retracted. The watermark delay is the knob: it bounds both
state size and how out-of-order the rights may be. Sources on
independent files/partitions can be read in any micro-batch order, so
the delay must cover cross-source skew too.

Custom stateful operator (``applyInPandasWithState``): Spark has no
built-in streaming as-of (stream-stream joins support interval
conditions, not latest-at-or-before). State per key = the carried
latest mature right (ts, value) + a small buffer of immature rows;
event-time timeout flushes keys whose buffered rows mature in a
trigger where the key receives no new data.

100 TB notes: state is hash-partitioned on the key; per-key buffer is
bounded by watermark-delay × per-key event rate (the carried right is
O(1)). RocksDB state store + TTL on a real cluster; the shuffle carries
(key, ms, side, id, value) only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_asof_enrich", "ASOF_OUTPUT_SCHEMA", "ASOF_STATE_SCHEMA"]

# left_ms/asof_ms are epoch milliseconds (timestamps cross the Arrow
# boundary as integers; callers convert with timestamp_millis()).
ASOF_OUTPUT_SCHEMA = (
    "key string, left_id string, left_ms bigint, "
    "asof_ms bigint, asof_value double"
)
ASOF_STATE_SCHEMA = (
    "carried_ms bigint, carried_val double, buf_side array<int>, "
    "buf_ms array<bigint>, buf_id array<string>, buf_val array<double>"
)

_RIGHT = 0  # sorts before left on equal timestamps (inclusive as-of tie)
_LEFT = 1


def _asof_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    wm = state.getCurrentWatermarkMs()
    carried_ms, carried_val = None, None
    pending: list[tuple[int, int, str | None, float | None]] = []
    if state.exists:
        carried_ms, carried_val, b_side, b_ms, b_id, b_val = state.get
        pending = [
            (int(s), int(m), i, None if v is None else float(v))
            for s, m, i, v in zip(b_side, b_ms, b_id, b_val)
        ]
    for pdf in pdfs:
        for s, m, i, v in zip(
            pdf["side"], pdf["ev_ms"], pdf["lid"], pdf["val"]
        ):
            pending.append(
                (int(s), int(m), None if pd.isna(i) else str(i),
                 None if pd.isna(v) else float(v))
            )

    mature = sorted(
        (p for p in pending if p[1] <= wm), key=lambda p: (p[1], p[0])
    )
    rest = [p for p in pending if p[1] > wm]

    out: list[tuple] = []
    for side, ms, lid, val in mature:
        if side == _RIGHT:
            carried_ms, carried_val = ms, val
        else:
            out.append((str(key[0]), lid, ms, carried_ms, carried_val))

    state.update(
        (
            carried_ms,
            carried_val,
            [p[0] for p in rest],
            [p[1] for p in rest],
            [p[2] for p in rest],
            [p[3] for p in rest],
        )
    )
    if rest:
        # flush matured buffers even if the key goes quiet; timeout must
        # sit strictly past the current watermark
        state.setTimeoutTimestamp(max(min(p[1] for p in rest), wm + 1))
    if out:
        yield pd.DataFrame(
            out,
            columns=["key", "left_id", "left_ms", "asof_ms", "asof_value"],
        )


def streaming_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "event_time",
    left_id: str = "event_id",
    right_value: str = "value",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Enrich streaming left events with the latest right value
    at-or-before each event's timestamp (same key), watermark-correct.

    Output (append, one row per left event once the watermark passes
    it): ``key, left_id, left_ms, asof_ms, asof_value`` — asof columns
    null when no right row precedes the event.
    """
    tagged_l = left.select(
        F.col(key).cast("string").alias("key"),
        F.col(ts).alias("event_time"),
        F.lit(_LEFT).alias("side"),
        F.col(left_id).cast("string").alias("lid"),
        F.lit(None).cast("double").alias("val"),
    )
    tagged_r = right.select(
        F.col(key).cast("string").alias("key"),
        F.col(ts).alias("event_time"),
        F.lit(_RIGHT).alias("side"),
        F.lit(None).cast("string").alias("lid"),
        F.col(right_value).cast("double").alias("val"),
    )
    unioned = (
        tagged_l.unionByName(tagged_r)
        .withWatermark("event_time", watermark)
        .withColumn("ev_ms", F.unix_millis(F.col("event_time")))
    )
    return unioned.groupBy("key").applyInPandasWithState(
        _asof_group,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
