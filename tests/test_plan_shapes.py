"""Physical-plan shape assertions for the pipeline operators: the scale
claims in BENCH.md (zero-shuffle projections, broadcast-only dims, one
shuffle for the as-of window) held once — these keep them held.

Counting rule: `ShuffleExchange`/`Exchange hashpartitioning|rangepartitioning`
nodes are data shuffles; `BroadcastExchange` is not (driver-collected
dim ships to every executor without repartitioning the fact side).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from vectra_py_spark.operators.asof import asof_join
from vectra_py_spark.operators.mixing import epoch_mix
from vectra_py_spark.operators.splits import assign_splits, stratified_sample
from vectra_py_spark.plans.entry_queries import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def test_assign_splits_is_pure_projection(spark):
    plan = _plan(assign_splits(load(spark, SF_ORACLE, "documents")))
    assert _n_shuffles(plan) == 0, plan
    assert "BroadcastExchange" not in plan, plan


def test_stratified_sample_broadcasts_the_dim_only(spark):
    plan = _plan(
        stratified_sample(
            load(spark, SF_ORACLE, "documents"), {"en": 300}, default_cut=200
        )
    )
    assert _n_shuffles(plan) == 0, plan
    assert "BroadcastExchange" in plan, plan


def test_epoch_mix_adds_no_shuffle(spark):
    plan = _plan(
        epoch_mix(load(spark, SF_ORACLE, "documents"), {"en": 0.5, "zh": 2.5})
    )
    assert _n_shuffles(plan) == 0, plan


def test_asof_join_is_one_shuffle_on_the_key(spark):
    evd = load(spark, SF_ORACLE, "events")
    t = F.expr("ts DIV 1000").alias("t_us")
    left = evd.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", t, "value"
    )
    right = evd.filter(F.col("event_type") == "purchase").select(
        "user_id", t, "value"
    )
    plan = _plan(asof_join(left, right))
    assert _n_shuffles(plan) == 1, plan


def test_scan_pruning_reaches_parquet(spark):
    # the split projection must not drag the text column through the scan
    plan = _plan(assign_splits(load(spark, SF_ORACLE, "documents")))
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "text" not in m.group(1), plan
