"""Vector math numerics vs numpy (SURVEY.md §5.2)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectra_py_spark.functions.vector import (
    cosine_similarity,
    cosine_to_query,
    dot,
    l2_norm,
    vector_literal,
)

VECS = [
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
    ([0.5, -0.5, 0.25], [-1.0, 2.0, 4.0]),
    ([1e-8, 1e8, -3.5], [2.0, -2.0, 2.0]),
]


@pytest.fixture(scope="module")
def df(spark):
    rows = [(i, a, b) for i, (a, b) in enumerate(VECS)]
    return spark.createDataFrame(rows, ["i", "a", "b"])


def test_dot_and_norm(df):
    out = (
        df.select(
            "i",
            dot(F.col("a"), F.col("b")).alias("d"),
            l2_norm(F.col("a")).alias("na"),
        )
        .orderBy("i")
        .collect()
    )
    for row, (a, b) in zip(out, VECS):
        assert row.d == pytest.approx(float(np.dot(a, b)), rel=1e-12)
        assert row.na == pytest.approx(float(np.linalg.norm(a)), rel=1e-12)


def test_cosine(df):
    out = (
        df.select("i", cosine_similarity(F.col("a"), F.col("b")).alias("c"))
        .orderBy("i")
        .collect()
    )
    for row, (a, b) in zip(out, VECS):
        expect = float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )
        assert row.c == pytest.approx(expect, rel=1e-12)


def test_cosine_to_query_with_stored_norm(spark):
    a = [3.0, 4.0]
    q = [1.0, 0.0]
    df = spark.createDataFrame([(a, 5.0)], ["vector", "norm"])
    got = df.select(
        cosine_to_query("vector", q, norm_col="norm").alias("s")
    ).collect()[0].s
    assert got == pytest.approx(3.0 / 5.0, rel=1e-12)


def test_zero_query_vector(spark):
    df = spark.createDataFrame([([1.0, 2.0],)], ["vector"])
    got = df.select(cosine_to_query("vector", [0.0, 0.0]).alias("s")).collect()[0].s
    assert got == 0.0


def test_vector_literal(spark):
    df = spark.range(1).select(vector_literal([1.5, -2.5]).alias("v"))
    assert df.collect()[0].v == [1.5, -2.5]


def test_float_input_cast(spark):
    """Fixture embeddings are FLOAT[]; math must promote to double."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("v", T.ArrayType(T.FloatType()), False)]
    )
    df = spark.createDataFrame([([0.1, 0.2, 0.3],)], schema)
    got = df.select(l2_norm(F.col("v")).alias("n")).collect()[0].n
    # float32-stored values, double math
    expect = math.sqrt(sum(float(np.float32(x)) ** 2 for x in [0.1, 0.2, 0.3]))
    assert got == pytest.approx(expect, rel=1e-9)


def test_project_expr_matches_numpy(spark):
    import numpy as np

    from vectra_py_spark.functions.vector import project_expr
    from vectra_py_spark.operators.similarity import seeded_hyperplanes

    vec = [float(i) / 7.0 for i in range(16)]
    planes = seeded_hyperplanes(16, 4)
    df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"])
    [row] = df.select(project_expr(planes, "embedding").alias("p")).collect()
    want = np.round(np.array(planes) @ np.array(vec), 6)
    assert row.p == [float(x) for x in want]


def test_project_expr_is_shuffle_free(spark):
    from vectra_py_spark.functions.vector import project_expr
    from vectra_py_spark.operators.similarity import seeded_hyperplanes

    df = spark.createDataFrame([(1, [1.0] * 8)], ["vec_id", "embedding"])
    plan = (
        df.select(project_expr(seeded_hyperplanes(8, 2), "embedding"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
