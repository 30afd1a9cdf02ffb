"""Temporal joins Spark lacks as built-ins: as-of join and range join,
expressed as compositions with the right scale properties (task brief:
"custom operators … as a composition of existing DataFrame ops").

- :func:`asof_join` — for every left event, the most recent right event
  at-or-before it with the same key. NOT a ``l.ts >= r.ts`` theta-join
  (Spark would BroadcastNestedLoop it — O(L·R) per key): both sides
  UNION into one stream tagged right-before-left on timestamp ties,
  then one ``last_value(..., ignorenulls)`` window per key carries the
  latest right row forward onto each left row. ONE shuffle on the key
  (identical shape to sessionization), no UDF, no range explosion.
  This is the standard log-enrichment primitive (trades joined to
  quotes, clicks to campaigns, features as-of a label timestamp).
- :func:`range_join_bucketed` — left events joined to right events in
  ``[t, t + width)``. A raw inequality join is again a nested loop;
  bucketing time by ``width`` and exploding each left row into its two
  probe buckets (a right event in the window lives in the left event's
  bucket or the next) turns it into ONE equi-join hashed on
  ``(key, bucket)`` followed by an exact range filter. Classic
  interval-join decomposition (Flink's interval join / window-bucketed
  range join literature); hashing on the composite key keeps hot keys
  spread across buckets instead of re-concentrating on the key alone.

Both have DuckDB twins (native ``ASOF JOIN``; plain inequality join)
so the driver's oracle gate checks them end to end.

100 TB notes: both shuffle only on (key[, bucket]) with map-side
column pruning; hot keys fall to AQE skew handling. The as-of union
never widens rows beyond left+right payload columns; the range join's
fan-out is bounded by events-per-width, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_bucketed"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "t_us",
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: left rows keep all columns and gain
    ``{prefix}{ts}`` + ``{prefix}{col}`` from the latest right row with
    ``right.ts <= left.ts`` and the same key (null if none).

    Tie rule: a right row AT the left row's timestamp matches
    (inclusive), enforced by sorting the right side first on equal
    timestamps.
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(ts).alias(f"{prefix}{ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts)],
    )
    tagged_l = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[ts].dataType).alias(f"{prefix}{ts}"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
          for c in right_cols],
        *[F.col(c) for c in lcols if c not in (key, ts)],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc(ts), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{prefix}{ts}"] + [f"{prefix}{c}" for c in right_cols]
    out = tagged_r.unionByName(tagged_l)
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).select(*lcols, *carried)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    width: int,
    key: str = "user_id",
    ts: str = "t_us",
    agg_col: str = "value",
) -> DataFrame:
    """For each left row: count + sum of right rows with the same key in
    ``[left.ts, left.ts + width)`` → (left columns…, n_in_range,
    sum_in_range).

    The left row explodes into its two probe buckets (a right row in
    the window lives in bucket ``b = ts div width`` or ``b + 1``), so
    the join is a genuine equi-join HASHED ON ``(key, bucket)`` — not
    an OR condition Catalyst would demote to a residual filter over a
    key-only join (which re-concentrates hot keys). A probe bucket
    matches a right row exactly once (the row's bucket equals b or b+1,
    never both), so the exact range filter then needs no dedup. Left
    rows with no match re-enter via the left-outer join; the final
    aggregate keys on the left's own columns.
    """
    lb = left.withColumn(
        "_pb",
        F.explode(
            F.array(
                F.expr(f"{ts} DIV {width}"), F.expr(f"{ts} DIV {width} + 1")
            )
        ),
    )
    rb = right.select(
        F.col(key).alias("_rkey"),
        F.col(ts).alias("_rts"),
        F.col(agg_col).alias("_rval"),
        F.expr(f"{ts} DIV {width}").alias("_rb"),
    )
    joined = lb.join(
        rb,
        (lb[key] == rb["_rkey"])
        & (rb["_rb"] == lb["_pb"])
        & (rb["_rts"] >= lb[ts])
        & (rb["_rts"] < lb[ts] + width),
        "left",
    )
    return (
        joined.groupBy(*left.columns)
        .agg(
            F.count("_rts").alias("n_in_range"),
            F.round(
                F.coalesce(F.sum("_rval"), F.lit(0.0)), 6
            ).alias("sum_in_range"),
        )
    )
