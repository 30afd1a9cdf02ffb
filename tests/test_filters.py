"""Filter-compiler truth table incl. P11 missing-field semantics and the
§2.9 intent-vs-bug decisions (SURVEY.md §2.2, FIXTURES.md §4)."""

from __future__ import annotations

import pytest

from vectra_py_spark.filters import FilterCompileError, compile_filter, filter_to_sql

ROWS = [
    # (id, category, priority, flag)
    (1, "a", 10, True),
    (2, "b", -5, False),
    (3, "c", None, True),
    (4, None, 7, None),
    (5, "a", 0, False),
]
COLS = ["id", "category", "priority", "flag"]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, COLS)


def ids(df, flt):
    out = df.filter(compile_filter(flt)).select("id").collect()
    return sorted(r.id for r in out)


def test_implicit_eq(df):
    assert ids(df, {"category": "a"}) == [1, 5]


def test_explicit_eq_ne(df):
    assert ids(df, {"category": {"$eq": "b"}}) == [2]
    # P11: $ne on a NULL field is FALSE (row 4 excluded) — not SQL 3VL.
    assert ids(df, {"category": {"$ne": "a"}}) == [2, 3]


def test_numeric_comparisons(df):
    assert ids(df, {"priority": {"$gt": 0}}) == [1, 4]
    assert ids(df, {"priority": {"$gte": 7}}) == [1, 4]
    assert ids(df, {"priority": {"$lt": 0}}) == [2]
    assert ids(df, {"priority": {"$lte": 0}}) == [2, 5]


def test_float_comparison_allowed(df):
    # §2.9.3: the reference wrongly demands int; intent allows floats.
    assert ids(df, {"priority": {"$gt": 0.5}}) == [1, 4]


def test_in_nin(df):
    assert ids(df, {"category": {"$in": ["a", "c"]}}) == [1, 3, 5]
    # P11: $nin on NULL field is FALSE — row 4 excluded despite "not in".
    assert ids(df, {"category": {"$nin": ["a", "c"]}}) == [2]


def test_bool_eq(df):
    assert ids(df, {"flag": True}) == [1, 3]
    # P11: NULL flag never matches, even $ne.
    assert ids(df, {"flag": {"$ne": True}}) == [2, 5]


def test_and_or(df):
    assert ids(df, {"$and": [{"category": "a"}, {"priority": {"$gt": 5}}]}) == [1]
    assert ids(df, {"$or": [{"category": "b"}, {"priority": {"$gte": 10}}]}) == [1, 2]


def test_multi_key_conjunction(df):
    assert ids(df, {"category": "a", "flag": False}) == [5]


def test_range_same_field(df):
    assert ids(df, {"priority": {"$gte": 0, "$lt": 10}}) == [4, 5]


def test_none_filter_value_rejects_all(df):
    assert ids(df, {"category": None}) == []


def test_unknown_op_falls_back_to_eq(df):
    assert ids(df, {"category": {"$weird": "a"}}) == [1, 5]


def test_empty_filter_matches_all(df):
    assert ids(df, {}) == [1, 2, 3, 4, 5]
    assert ids(df, None) == [1, 2, 3, 4, 5]


def test_in_requires_list(df):
    with pytest.raises(FilterCompileError):
        compile_filter({"category": {"$in": "a"}})
    # §2.9.2 intent: booleans excluded from membership lists.
    with pytest.raises(FilterCompileError):
        compile_filter({"flag": {"$in": [True]}})


def test_numeric_op_rejects_non_number():
    with pytest.raises(FilterCompileError):
        compile_filter({"priority": {"$gt": "high"}})
    with pytest.raises(FilterCompileError):
        compile_filter({"priority": {"$gt": True}})


def test_unknown_logical_op():
    with pytest.raises(FilterCompileError):
        compile_filter({"$nor": [{"category": "a"}]})


def test_sql_rendering_matches_spark(spark, df):
    """filter_to_sql must stay in lockstep with compile_filter."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id INT, category VARCHAR, priority INT, flag BOOLEAN)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ROWS)
    filters = [
        {"category": "a"},
        {"category": {"$ne": "a"}},
        {"priority": {"$gt": 0}},
        {"priority": {"$gte": 0, "$lt": 10}},
        {"category": {"$in": ["a", "c"]}},
        {"category": {"$nin": ["a", "c"]}},
        {"flag": {"$ne": True}},
        {"$or": [{"category": "b"}, {"priority": {"$gte": 10}}]},
        {"$and": [{"category": "a"}, {"priority": {"$gt": 5}}]},
        {"category": "a", "flag": False},
        {"category": None},
    ]
    for flt in filters:
        sql_ids = sorted(
            r[0]
            for r in con.execute(
                f"SELECT id FROM t WHERE {filter_to_sql(flt)}"
            ).fetchall()
        )
        assert ids(df, flt) == sql_ids, f"divergence for {flt}"
    con.close()
