"""Sketch-based approximate aggregations: the scale path for distinct
counts and quantiles.

The exact `distinct_users` / `value_quantiles` queries (see
`plans/entry_queries.py`) shuffle every distinct key / sort every
group. At 100 TB the standard move is a mergeable sketch: constant
memory per group, one map-side partial per partition, an
order-insensitive merge — the shuffle carries sketches, not data.

Spark ships both sketches JVM-side; these wrappers pin the idiom:

- :func:`approx_distinct` — HyperLogLog++ via
  ``approx_count_distinct(col, rsd)``. Deterministic for a given
  input set (hash-based; merge is a commutative max over registers),
  standard error ≈ rsd.
- :func:`approx_quantiles` — Greenwald-Khanna via
  ``percentile_approx(col, probs, accuracy)``; rank error ≤
  n/accuracy per group.

Neither can hash-match an exact-SQL oracle (different algorithm class
— DuckDB's approx functions use different sketch parameters), so the
correctness gate is a tolerance test against the EXACT aggregates
(`tests/test_sketches.py`), and the exact twins remain the oracle-able
`queries()` entries. This mirrors how the reference treats its own
approximate claims: exact result defined first, approximation bounded
against it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["approx_distinct", "approx_quantiles"]


def approx_distinct(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-key approximate distinct count: (keys…, approx_distinct)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-key approximate quantiles: (keys…, q_<prob> …)."""
    agg = [
        F.percentile_approx(col, p, accuracy).alias(
            f"q_{str(p).replace('.', '_')}"
        )
        for p in probs
    ]
    return df.groupBy(*keys).agg(*agg)
