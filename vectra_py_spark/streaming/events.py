"""Event-stream operators: tumbling windows, sessionization, watermarks.

Design rule: one logical definition, two physical modes.

- **Batch**: the operators below are plain DataFrame transformations —
  they run on the parquet ``events`` table and are oracle-checkable
  against DuckDB SQL.
- **Streaming**: the same aggregations run on a ``readStream`` source
  with a watermark (:func:`streaming_windowed_counts`); Spark's
  incremental state store handles late data up to the watermark and
  emits append-mode results per window close.

Timestamp discipline: the fixture parquet stores TIMESTAMP(NANOS),
which Spark reads as BIGINT nanoseconds (``nanosAsLong``) and DuckDB
truncates to microseconds. All window math therefore normalizes to
**epoch microseconds** (``floor(ns/1000)`` ≡ DuckDB ``epoch_us``) so
the two engines bucket identically.

Scale: tumbling-window counts are a single shuffle on (window, keys)
with map-side partial aggregation. Sessionization is the classic
gaps-and-islands — one shuffle on user, one window sort per user
partition; skewed users are the hazard (AQE skew handling, or salt the
session id computation per day first). Streaming state is bounded by
watermark horizon × key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "event_time_col",
    "windowed_counts",
    "sliding_counts",
    "sliding_counts_sql",
    "windowed_counts_sql",
    "sessionize",
    "sessionize_sql",
    "top_users_per_type",
    "top_users_per_type_sql",
    "streaming_windowed_counts",
    "streaming_sliding_counts",
]

MICROS_PER_HOUR = 3_600_000_000
DEFAULT_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def event_time_col(ts_col: str = "ts", df: DataFrame | None = None):
    """Event time → epoch microseconds, for either physical layout.

    The fixture ``events.ts`` has shipped as both TIMESTAMP(NANOS)
    read as BIGINT (nanosAsLong) and as ``timestamp[us]`` read as
    TIMESTAMP_NTZ; branch on the actual dtype when a frame is given.
    For the BIGINT layout use integer ``DIV``, not ``floor(x/1000)``:
    float division would round a 19-digit nanosecond count (doubles
    carry ~15.9 digits) and drift ±1µs. For the timestamp layout,
    ``unix_micros`` after a cast to TIMESTAMP is exact (session tz is
    pinned to UTC, so NTZ-naive == DuckDB ``epoch_us``).
    """
    if df is not None:
        dtype = dict(df.dtypes).get(ts_col, "bigint")
        if dtype == "timestamp_ntz":
            # naive-as-UTC via wall-clock decomposition. Any route
            # through an NTZ→TIMESTAMP cast (even inside
            # to_utc_timestamp) re-interprets the wall time in the
            # SESSION timezone, and the driver runs a vanilla session
            # that may not pin UTC. date/extract on NTZ are tz-free,
            # and extract(SECOND) is a decimal carrying the micros.
            return F.expr(
                f"cast(unix_date(cast({ts_col} as date)) as bigint)"
                f"   * 86400000000"
                f" + cast(extract(hour from {ts_col}) as bigint) * 3600000000"
                f" + cast(extract(minute from {ts_col}) as bigint) * 60000000"
                f" + cast(extract(second from {ts_col}) * 1000000 as bigint)"
            )
        if dtype.startswith("timestamp"):
            return F.unix_micros(F.col(ts_col))
    return F.expr(f"{ts_col} DIV 1000")


# ---------------------------------------------------------------------------
# Tumbling window aggregation (batch + oracle)
# ---------------------------------------------------------------------------
def windowed_counts(
    df: DataFrame,
    window_us: int = MICROS_PER_HOUR,
    ts_col: str = "ts",
) -> DataFrame:
    """Events per (tumbling window, event_type) with value sums."""
    t = event_time_col(ts_col, df)
    # t - t % w == (t DIV w) * w in pure integer arithmetic (no float hop)
    bucket = (t - (t % window_us)).cast("bigint").alias("window_start_us")
    return (
        df.groupBy(bucket, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .orderBy("window_start_us", "event_type")
    )


def windowed_counts_sql(
    window_us: int = MICROS_PER_HOUR, table: str = "events"
) -> str:
    return f"""
        SELECT CAST((epoch_us(ts) // {window_us}) * {window_us} AS BIGINT)
                   AS window_start_us,
               event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total_value
        FROM {table}
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Sessionization (gaps-and-islands; batch twin of session_window)
# ---------------------------------------------------------------------------
def sessionize(
    df: DataFrame,
    gap_us: int = DEFAULT_SESSION_GAP_US,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """One row per (user, session): start/end, event count, value sum.

    A new session starts when the gap since the user's previous event
    exceeds ``gap_us``. Streaming twin: ``F.session_window(ts, gap)``
    with a watermark; this batch formulation is the oracle.
    """
    t = event_time_col(ts_col, df)
    w = Window.partitionBy(user_col).orderBy(t)
    gap_flag = (
        F.when(t - F.lag(t).over(w) > gap_us, 1)
        .otherwise(0)
    )
    with_session = df.withColumn("_t", t).withColumn(
        "session_idx",
        F.sum(gap_flag).over(
            Window.partitionBy(user_col)
            .orderBy(F.col("_t"))
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_session.groupBy(user_col, "session_idx")
        .agg(
            F.min("_t").alias("session_start_us"),
            F.max("_t").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select(
            user_col, "session_start_us", "session_end_us",
            "n_events", "total_value",
        )
        .orderBy(user_col, "session_start_us")
    )


def sessionize_sql(
    gap_us: int = DEFAULT_SESSION_GAP_US, table: str = "events"
) -> str:
    return f"""
        WITH t AS (
            SELECT user_id, epoch_us(ts) AS t_us, value,
                   CASE WHEN epoch_us(ts)
                             - LAG(epoch_us(ts)) OVER
                               (PARTITION BY user_id ORDER BY epoch_us(ts))
                             > {gap_us}
                        THEN 1 ELSE 0 END AS new_session
            FROM {table}
        ),
        s AS (
            SELECT user_id, t_us, value,
                   SUM(new_session) OVER
                       (PARTITION BY user_id ORDER BY t_us
                        ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM t
        )
        SELECT user_id,
               MIN(t_us) AS session_start_us,
               MAX(t_us) AS session_end_us,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total_value
        FROM s
        GROUP BY user_id, session_idx
        ORDER BY user_id, session_start_us
    """


# ---------------------------------------------------------------------------
# Ranked window function (top-N per group)
# ---------------------------------------------------------------------------
def top_users_per_type(df: DataFrame, n: int = 3) -> DataFrame:
    """Top-N users by total value within each event_type (dense_rank)."""
    per_user = df.groupBy("event_type", "user_id").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return (
        per_user.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= n)
        .orderBy("event_type", "rnk", "user_id")
    )


def top_users_per_type_sql(n: int = 3, table: str = "events") -> str:
    return f"""
        WITH per_user AS (
            SELECT event_type, user_id,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                       AS total_value
            FROM {table}
            GROUP BY 1, 2
        )
        SELECT * FROM (
            SELECT event_type, user_id, total_value,
                   DENSE_RANK() OVER
                       (PARTITION BY event_type
                        ORDER BY total_value DESC, user_id ASC) AS rnk
            FROM per_user
        )
        WHERE rnk <= {n}
        ORDER BY event_type, rnk, user_id
    """


# ---------------------------------------------------------------------------
# Structured Streaming surface
# ---------------------------------------------------------------------------
def streaming_windowed_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "event_time",
) -> DataFrame:
    """The streaming twin of :func:`windowed_counts`.

    ``stream_df`` must carry a TIMESTAMP column (convert BIGINT nanos
    with ``F.timestamp_micros(floor(ts/1000))``). Watermark bounds state
    and admits late events up to the horizon; append-mode emits each
    window once it closes.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_sliding_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "event_time",
) -> DataFrame:
    """The streaming twin of :func:`sliding_counts` — the same
    ``F.window`` call with a slide duration; state is bounded by
    watermark horizon × windows-per-event × key cardinality."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding window aggregation (batch + oracle)
# ---------------------------------------------------------------------------
def sliding_counts(
    df: DataFrame,
    window_us: int = MICROS_PER_HOUR,
    slide_us: int = MICROS_PER_HOUR // 4,
    ts_col: str = "ts",
) -> DataFrame:
    """Events per (sliding window, event_type): window length
    ``window_us``, advancing every ``slide_us`` — each event lands in
    ``window/slide`` overlapping windows (the batch twin of
    ``F.window(ts, w, s)`` with a slide; formulated portably so DuckDB
    can run it verbatim).

    100 TB design: the explode multiplies rows by window/slide (4 here)
    BEFORE the aggregate — the standard cost of sliding windows — but
    the map-side partial agg collapses each partition to its distinct
    (window, type) pairs, so the exchange carries window-count rows,
    not event-count·4. ``window_us % slide_us == 0`` keeps window
    starts on the slide grid (integer arithmetic, no float hop).
    """
    if window_us % slide_us:
        raise ValueError("window_us must be a multiple of slide_us")
    k = window_us // slide_us
    t = event_time_col(ts_col, df)
    anchor = t - (t % slide_us)  # last grid point <= t
    starts = F.sequence(
        anchor - (k - 1) * slide_us, anchor, F.lit(slide_us)
    )
    return (
        df.select(
            F.explode(starts).alias("window_start_us"),
            "event_type",
            "value",
        )
        .filter(F.col("window_start_us") >= 0)
        .groupBy("window_start_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .orderBy("window_start_us", "event_type")
    )


def sliding_counts_sql(
    window_us: int = MICROS_PER_HOUR,
    slide_us: int = MICROS_PER_HOUR // 4,
    table: str = "events",
) -> str:
    k = window_us // slide_us
    return f"""
        WITH e AS (
            SELECT epoch_us(ts) - (epoch_us(ts) % {slide_us}) AS anchor,
                   event_type, value
            FROM {table}
        ),
        w AS (
            SELECT anchor - ({k - 1} - i.i) * {slide_us} AS window_start_us,
                   event_type, value
            FROM e, LATERAL unnest(range({k})) AS i(i)
        )
        SELECT window_start_us, event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total_value
        FROM w
        WHERE window_start_us >= 0
        GROUP BY window_start_us, event_type
        ORDER BY window_start_us, event_type
    """
