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


def test_skew_report_flags_hot_key(skewed):
    from vectra_py_spark.operators.skew import skew_report

    big, _ = skewed
    rows = skew_report(big, "k", top_n=5).collect()
    # hot key 1 carries 90% of rows and tops the report
    assert rows[0].k == 1
    assert rows[0].n_rows == 4500
    assert abs(rows[0].share - 0.9) < 1e-9
    # x_mean = n_rows * n_keys / total = 4500 * 501 / 5000
    assert abs(rows[0].x_mean - 4500 * 501 / 5000) < 1e-6
    # the cold tail sits at x_mean ~ 0.1, deterministically tie-broken
    assert [r.k for r in rows[1:]] == sorted(r.k for r in rows[1:])
    for r in rows[1:]:
        assert r.n_rows == 1
