"""Deterministic data mixing: per-stratum epoch weights (up/down-
sampling) for training-mix construction.

Pretraining mixes repeat high-value sources several epochs and
downsample bulk sources below one epoch (temperature sampling yields
exactly such per-source epoch weights). :func:`epoch_mix` materializes
a mix deterministically: a row with weight ``e`` appears
``floor(e)`` times plus one more iff its salted hash bucket falls under
the fractional part — so the realized mix hits the target weight to
±1/N_BUCKETS with NO RNG, and is reproducible row-for-row across reruns
and backfills (same property as
:func:`~vectra_py_spark.operators.splits.assign_splits`, different hash
salt so mixing and splitting stay independent).

Plan shape: broadcast-join the per-stratum weight dim, then
``posexplode(array_repeat(...))`` — a narrow map; no shuffle at all.
At 100 TB the explode multiplies bytes by the mix factor exactly where
a copy-based mix must, but streams through (never materializes the
repeated corpus), and downsampled strata drop rows before any
downstream shuffle.

DuckDB twin: the same arithmetic with ``LATERAL unnest(range(n))``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectra_py_spark.operators.splits import N_BUCKETS, hash_bucket, hash_bucket_sql

__all__ = ["epoch_mix", "epoch_mix_sql", "temperature_mix", "temperature_mix_sql"]

_SALT = ":mix"
_TEMP_SALT = ":tmix"


def _base_frac(e: float) -> tuple[int, int]:
    base = math.floor(e)
    return base, int(round((e - base) * N_BUCKETS))


def epoch_mix(
    df: DataFrame,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, stratum, copy_idx) with each row repeated per its stratum's
    epoch weight; weights < 1 downsample (some rows appear 0 times)."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(k, *_base_frac(v)) for k, v in sorted(epochs.items())],
        f"{strat_col} string, base int, frac int",
    )
    dbase, dfrac = _base_frac(default_epochs)
    bucket = hash_bucket(
        F.concat(F.col(id_col).cast("string"), F.lit(_SALT))
    )
    n_copies = (
        F.coalesce(F.col("base"), F.lit(dbase))
        + (bucket < F.coalesce(F.col("frac"), F.lit(dfrac))).cast("int")
    )
    return (
        df.select(id_col, strat_col)
        .join(F.broadcast(dim), strat_col, "left")
        .withColumn("n_copies", n_copies)
        .select(
            id_col,
            strat_col,
            F.posexplode(
                F.array_repeat(F.lit(1), F.col("n_copies"))
            ).alias("copy_idx", "_one"),
        )
        .select(id_col, strat_col, "copy_idx")
    )


def epoch_mix_sql(
    epochs: dict[str, float],
    default_epochs: float = 1.0,
    table: str = "documents",
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> str:
    dbase, dfrac = _base_frac(default_epochs)
    base_cases = " ".join(
        f"WHEN {strat_col} = '{k}' THEN {_base_frac(v)[0]}"
        for k, v in sorted(epochs.items())
    )
    frac_cases = " ".join(
        f"WHEN {strat_col} = '{k}' THEN {_base_frac(v)[1]}"
        for k, v in sorted(epochs.items())
    )
    b = hash_bucket_sql(f"CAST({id_col} AS VARCHAR) || '{_SALT}'")
    return f"""
        SELECT {id_col}, {strat_col}, CAST(u.copy_idx AS INT) AS copy_idx
        FROM (
            SELECT {id_col}, {strat_col},
                   CASE {base_cases} ELSE {dbase} END
                   + CASE WHEN {b} < CASE {frac_cases} ELSE {dfrac} END
                          THEN 1 ELSE 0 END AS n_copies
            FROM {table}
        ),
        LATERAL unnest(range(0, n_copies)) AS u(copy_idx)
    """


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based multilingual mixing (XLM-R style): per-stratum
    epoch weights DERIVED from the corpus itself — ``w_s ∝ n_s^α``,
    renormalized so the mixed corpus keeps its total size; small
    strata upsample, bulk strata downsample. Same deterministic
    hash-bucket materialization as :func:`epoch_mix`.

    ``alpha=0.5`` computes ``n^α`` as ``sqrt(n)`` — bit-identical in
    DuckDB, which keeps the floor/round bucket arithmetic (the only
    discretization) oracle-exact. Other α go through ``pow`` (same
    formula, ULP-level cross-engine risk at bucket boundaries).

    100 TB design: the weight dim is a stratum-count aggregate (one
    map-side-combined exchange over stratum keys) crossed with a 1-row
    total — both broadcast back; the mix explode itself stays the
    narrow no-shuffle map of :func:`epoch_mix`.
    """
    sqrt_n = (
        F.sqrt(F.col("n"))
        if alpha == 0.5
        else F.pow(F.col("n"), F.lit(alpha))
    )
    counts = df.groupBy(strat_col).agg(F.count(F.lit(1)).alias("n"))
    tot = (
        counts.select(
            F.sum("n").alias("T"),
            F.sum(
                F.sqrt(F.col("n"))
                if alpha == 0.5
                else F.pow(F.col("n"), F.lit(alpha))
            ).alias("Z"),
        )
    )
    dim = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            strat_col,
            ((sqrt_n / F.col("Z")) * F.col("T") / F.col("n")).alias("e"),
        )
        .select(
            strat_col,
            F.floor("e").cast("int").alias("base"),
            F.round((F.col("e") - F.floor("e")) * N_BUCKETS, 0)
            .cast("int")
            .alias("frac"),
        )
    )
    bucket = hash_bucket(
        F.concat(F.col(id_col).cast("string"), F.lit(_TEMP_SALT))
    )
    n_copies = F.col("base") + (bucket < F.col("frac")).cast("int")
    return (
        df.select(id_col, strat_col)
        .join(F.broadcast(dim), strat_col)
        .withColumn("n_copies", n_copies)
        .select(
            id_col,
            strat_col,
            F.posexplode(
                F.array_repeat(F.lit(1), F.col("n_copies"))
            ).alias("copy_idx", "_one"),
        )
        .select(id_col, strat_col, "copy_idx")
    )


def temperature_mix_sql(
    alpha: float = 0.5,
    table: str = "documents",
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> str:
    pw = "sqrt(n)" if alpha == 0.5 else f"pow(n, {alpha})"
    b = hash_bucket_sql(f"CAST({id_col} AS VARCHAR) || '{_TEMP_SALT}'")
    return f"""
        WITH c AS (
            SELECT {strat_col}, count(*) AS n FROM {table} GROUP BY 1
        ),
        t AS (SELECT SUM(n) AS T, SUM({pw}) AS Z FROM c),
        dim AS (
            SELECT {strat_col},
                   CAST(floor(e) AS INT) AS base,
                   CAST(round((e - floor(e)) * {N_BUCKETS}, 0) AS INT)
                       AS frac
            FROM (SELECT {strat_col}, ({pw} / Z) * T / n AS e
                  FROM c CROSS JOIN t)
        )
        SELECT {id_col}, {strat_col}, CAST(u.copy_idx AS INT) AS copy_idx
        FROM (
            SELECT d.{id_col}, d.{strat_col},
                   dim.base
                   + CASE WHEN {b} < dim.frac THEN 1 ELSE 0 END AS n_copies
            FROM {table} d JOIN dim USING ({strat_col})
        ) s,
        LATERAL unnest(range(0, n_copies)) AS u(copy_idx)
    """
