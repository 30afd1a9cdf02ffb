"""Unit semantics + plan shape for temporal joins
(`vectra_py_spark.operators.asof`) — cross-engine parity is covered by
`test_entry_oracle.py` (asof_enrich, range_join entries)."""

from __future__ import annotations

import pytest

from vectra_py_spark.operators.asof import asof_join, range_join_bucketed


def _rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_asof_join_picks_latest_at_or_before(spark):
    left = _rows(
        spark,
        [(1, 100, 10.0), (1, 200, 20.0), (1, 50, 5.0), (2, 100, 1.0)],
        "user_id long, t_us long, value double",
    )
    right = _rows(
        spark,
        # user 1: purchases at 60, 100, 150; user 3: never matches
        [(1, 60, 0.6), (1, 100, 1.0), (1, 150, 1.5), (3, 10, 9.9)],
        "user_id long, t_us long, value double",
    )
    got = {
        (r["user_id"], r["t_us"]): (r["asof_t_us"], r["asof_value"])
        for r in asof_join(left, right).collect()
    }
    assert got == {
        (1, 50): (None, None),        # nothing at-or-before 50
        (1, 100): (100, 1.0),         # tie: same-timestamp right matches
        (1, 200): (150, 1.5),         # latest of 60/100/150
        (2, 100): (None, None),       # user has no right rows
    }


@pytest.mark.slow
def test_asof_join_keeps_left_row_count_and_columns(spark):
    left = _rows(spark, [(1, 10, 1.0)] , "user_id long, t_us long, value double")
    right = _rows(spark, [(1, 5, 2.0)], "user_id long, t_us long, value double")
    out = asof_join(left, right)
    assert out.columns == ["user_id", "t_us", "value", "asof_t_us", "asof_value"]
    assert out.count() == 1


def test_range_join_bucketed_window_edges(spark):
    left = _rows(spark, [(1, 1000), (1, 5000), (2, 0)], "user_id long, t_us long")
    right = _rows(
        spark,
        # for left (1,1000) width 100: in [1000,1100) → 1000, 1099; not 1100
        [(1, 1000, 1.0), (1, 1099, 2.0), (1, 1100, 4.0), (1, 999, 8.0)],
        "user_id long, t_us long, value double",
    )
    got = {
        (r["user_id"], r["t_us"]): (r["n_in_range"], r["sum_in_range"])
        for r in range_join_bucketed(left, right, width=100).collect()
    }
    assert got == {(1, 1000): (2, 3.0), (1, 5000): (0, 0.0), (2, 0): (0, 0.0)}


def test_range_join_plan_is_hash_join_not_nested_loop(spark):
    left = _rows(spark, [(1, 1000)], "user_id long, t_us long")
    right = _rows(spark, [(1, 1050, 1.0)], "user_id long, t_us long, value double")
    plan = range_join_bucketed(
        left, right, width=100
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
