"""Bucketed-table co-located join: the join on the bucket key must run
without any shuffle exchange on either side, and bucket pruning must
serve point lookups."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.sources.bucketed import read_table, write_bucketed

pytestmark = pytest.mark.slow  # bucketed-table writes per test — full-suite tier


@pytest.fixture()
def bucketed_pair(spark):
    base = tempfile.mkdtemp()
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_flag")
    )
    items = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("i_key"), (F.col("id") * 2).alias("i_qty")
    )
    write_bucketed(orders, "t_orders_b", "o_key", 8, path=f"{base}/orders")
    write_bucketed(items, "t_items_b", "i_key", 8, path=f"{base}/items")
    yield "t_orders_b", "t_items_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    to, ti = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, to).join(
            read_table(spark, ti),
            F.col("o_key") == F.col("i_key"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness: every item matches exactly one order
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_pair):
    _, ti = bucketed_pair
    agg = read_table(spark, ti).groupBy("i_key").agg(F.sum("i_qty").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000


def test_bucket_pruning_on_point_lookup(spark, bucketed_pair):
    to, _ = bucketed_pair
    # the auto-bucketed-scan heuristic turns bucketed reads off for
    # filter-only plans (no exchange to elide); force it on so the
    # point lookup prunes to one bucket file
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = read_table(spark, to).filter(F.col("o_key") == 1234)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert df.count() == 1
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
