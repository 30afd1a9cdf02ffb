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

__all__ = ["approx_distinct", "approx_quantiles", "cms_heavy_hitters"]


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


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
    sample_frac: float = 0.05,
) -> list[tuple[str, int]]:
    """Approximate heavy hitters via Count-Min Sketch — the third
    mergeable sketch (with HLL++ and Greenwald-Khanna above), for the
    exact `frequent_tokens` query's scale path.

    Build: ``count_min_sketch(col, eps, confidence, seed)`` — JVM-side,
    one map-side partial sketch per partition, order-insensitive merge;
    the shuffle carries ~``e/eps × ln(1/(1-confidence))`` counters
    regardless of data size. Candidates: the distinct values of a
    ``sample_frac`` sample (a true heavy hitter appears in a fraction-f
    sample with probability → 1; the classic sample-then-verify split).
    Each candidate's count is then read from the sketch driver-side —
    CMS never underestimates and overestimates by ≤ eps·N with
    probability ``confidence``, so the top-k by estimated count is a
    superset-quality ranking verified by the tolerance test.

    Returns the top ``k`` (value, estimated_count), count-desc then
    value-asc. Deterministic for a fixed seed (sketch hashing and the
    sample are both seeded).
    """
    spark = df.sparkSession
    sketch_bytes = bytes(
        df.agg(
            F.expr(
                f"count_min_sketch({col}, {eps}d, {confidence}d, {seed})"
            ).alias("s")
        ).head()["s"]
    )
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(sketch_bytes)
    )
    candidates = [
        r[0]
        for r in df.select(col)
        .sample(fraction=sample_frac, seed=seed)
        .filter(F.col(col).isNotNull())
        .distinct()
        .collect()
    ]
    scored = [(v, int(cms.estimateCount(v))) for v in candidates]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]
