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

__all__ = ["epoch_mix", "epoch_mix_sql"]

_SALT = ":mix"


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
