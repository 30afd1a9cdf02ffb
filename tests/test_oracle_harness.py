"""Regression tests: the local oracle harness must be driver-strict.

Round 2 shipped three hash-red queries (DuckDB ``SUM(BIGINT)`` →
HUGEINT → pandas float64 → ``"4568.0"`` vs Spark's ``"4568"``) and one
``err`` (array result column) while the local sweep was green, because
the old harness coerced int→float and stringified list cells. These
tests feed the harness those exact failure shapes and assert it goes
red/raises like the driver does.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare


def test_hugeint_sum_mismatch_is_red(spark):
    """Uncast DuckDB SUM(BIGINT) (HUGEINT→float64) must hash-mismatch
    Spark's BIGINT even though the values are numerically equal."""
    sdf = spark.sql("SELECT 'a' AS k, CAST(4568 AS BIGINT) AS total")
    ok, detail = compare(
        spark, SF_SMOKE, sdf,
        "SELECT 'a' AS k, SUM(x) AS total FROM (SELECT 4568 AS x)",
    )
    assert not ok and "mismatch" in detail


def test_hugeint_sum_cast_is_green(spark):
    sdf = spark.sql("SELECT 'a' AS k, CAST(4568 AS BIGINT) AS total")
    ok, detail = compare(
        spark, SF_SMOKE, sdf,
        "SELECT 'a' AS k, CAST(SUM(x) AS BIGINT) AS total "
        "FROM (SELECT 4568 AS x)",
    )
    assert ok, detail


def test_array_column_raises(spark):
    """Array-typed result columns kill the driver canonicalizer
    (unhashable cells) — the harness must raise, not stringify."""
    sdf = spark.sql(
        "SELECT 1 AS vec_id, array(0.1D, 0.2D) AS proj "
        "UNION ALL SELECT 2, array(0.3D, 0.4D)"
    )
    with pytest.raises(TypeError):
        compare(
            spark, SF_SMOKE, sdf,
            "SELECT 1 AS vec_id, [0.1, 0.2] AS proj "
            "UNION ALL SELECT 2, [0.3, 0.4]",
        )


def test_int_vs_float_dtype_is_red(spark):
    """No int→float coercion: a float64 oracle column against an int64
    Spark column is a dtype (stringification) mismatch."""
    sdf = spark.sql("SELECT CAST(7 AS BIGINT) AS v")
    ok, _ = compare(spark, SF_SMOKE, sdf, "SELECT 7.0 AS v")
    assert not ok


def test_plain_match_is_green(spark):
    sdf = spark.sql(
        "SELECT 'x' AS k, 1.5D AS v UNION ALL SELECT 'y', 2.5D"
    )
    ok, detail = compare(
        spark, SF_SMOKE, sdf,
        "SELECT 'y' AS k, 2.5 AS v UNION ALL SELECT 'x', 1.5",
    )
    assert ok, detail
