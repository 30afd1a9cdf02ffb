"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
:mod:`vectra_py_spark.session`) splits oversized shuffle partitions at
runtime and is the FIRST line of defense. These helpers are for the
cases AQE can't fix:

- a *single key* so hot that even a split partition is one task's work
  (salting spreads ONE key across ``n_salts`` tasks);
- deterministic plans where runtime re-planning is disabled (streaming
  state joins, canary comparisons).

Both transformations are semantics-preserving — the tests assert
equality against the unsalted plan on skewed data.

Scale notes (100 TB): salting multiplies the small side by
``n_salts`` — keep it broadcast-sized after replication. Two-phase agg
adds one extra narrow shuffle but caps per-task input at
``|hot key| / n_salts`` rows; pick ``n_salts`` ≈ cluster cores /
distinct hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "two_phase_agg_count", "skew_report", "skew_report_sql"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: salt the big side into
    ``n_salts`` sub-keys, replicate the small side across every salt,
    join on (key, salt). Each hot key's rows spread over ``n_salts``
    tasks instead of one.
    """
    big_salted = big.withColumn(
        "_salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_replicated = small.crossJoin(F.broadcast(salts))
    return big_salted.join(small_replicated, [key, "_salt"], how).drop("_salt")


def two_phase_agg_count(
    df: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """``groupBy(key).count()`` for a skewed key column, in two phases:
    partial count on (key, salt) — hot keys split across tasks — then
    the tiny per-key merge. Spark's hash aggregate already does map-side
    partials; the explicit form matters when the *reduce* side of one
    key exceeds a task (e.g. collect_list/median-style aggs) and as the
    template for salting arbitrary aggregations.
    """
    return (
        df.withColumn("_salt", (F.rand(seed=0) * n_salts).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )


def skew_report(
    df: DataFrame, key: str, top_n: int = 10, dp: int = 6
) -> DataFrame:
    """Pre-flight shuffle-skew diagnostic for a prospective join/agg
    key: the ``top_n`` heaviest keys with their row counts, share of
    the table, and hotness relative to the mean key (``x_mean`` IS the
    skew factor — the task-size blowup an unsalted shuffle on this key
    suffers, and the ``n_salts`` a salted plan must spread it over).

    The thing to run BEFORE shipping a 100 TB ``groupBy``/``join``:
    one (key) partial-agg'd count, a 1-row total/distinct re-aggregate
    broadcast back, ``TakeOrderedAndProject`` for the top slice —
    nothing driver-side, output is ``top_n`` rows. A key with
    ``x_mean ≈ 1`` needs nothing; ``x_mean`` in the tens → AQE skew
    split handles it; hundreds+ → :func:`salted_join` /
    :func:`two_phase_agg_count` territory.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_keys"),
    )
    return (
        counts.join(F.broadcast(stats))
        .select(
            F.col(key),
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), dp).alias("share"),
            # n_rows * (_keys / _total): the division goes first so the
            # arithmetic stays in double — n_rows * _keys in int64
            # overflows at exactly the table sizes this diagnostic is
            # for (1e11-row hot key × 1e8 keys > 2^63)
            F.round(
                F.col("n_rows") * (F.col("_keys") / F.col("_total")), dp
            ).alias("x_mean"),
        )
        .orderBy(F.desc("n_rows"), key)
        .limit(top_n)
    )


def skew_report_sql(
    key: str, table: str, top_n: int = 10, dp: int = 6
) -> str:
    """DuckDB twin of :func:`skew_report`."""
    return f"""
        WITH counts AS (
          SELECT {key}, COUNT(*) AS n_rows FROM {table} GROUP BY {key}
        ), stats AS (
          SELECT SUM(n_rows) AS _total, COUNT(*) AS _keys FROM counts
        )
        SELECT {key}, CAST(n_rows AS BIGINT) AS n_rows,
               ROUND(n_rows / _total, {dp}) AS share,
               ROUND(n_rows * (_keys / _total), {dp}) AS x_mean
        FROM counts, stats
        ORDER BY n_rows DESC, {key}
        LIMIT {top_n}
    """
