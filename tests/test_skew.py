"""Salted join / two-phase agg are semantics-preserving on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.skew import salted_join, two_phase_agg_count


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (20, "cold20"), (30, "cold30")], ["k", "name"]
    )
    return big.cache(), small


def test_salted_join_equals_plain(skewed):
    big, small = skewed
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", n_salts=8).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(skewed):
    big, small = skewed
    plain = big.join(small, "k", "left").select("k", "payload", "name")
    salted = salted_join(big, small, "k", n_salts=4, how="left").select(
        "k", "payload", "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_two_phase_count_equals_plain(skewed):
    big, _ = skewed
    plain = {r.k: r.n for r in big.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    two = {r.k: r.n for r in two_phase_agg_count(big, "k", n_salts=8).collect()}
    assert two == plain
