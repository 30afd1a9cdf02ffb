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

__all__ = ["salted_join", "two_phase_agg_count"]


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
