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


# --------------------------------------------------------------------------
# Round-2 query shapes
# --------------------------------------------------------------------------
def test_event_funnel_one_exchange_for_three_windows(spark):
    from vectra_py_spark.plans.entry_queries import q_event_funnel

    plan = _plan(q_event_funnel(spark, SF_ORACLE))
    # one hash shuffle on user_id serves all three Windows AND the final
    # per-user aggregate; the only other is the output sort
    assert _n_shuffles(plan) <= 2, plan
    assert plan.count("Window") >= 3, plan


def test_big_spenders_facts_never_shuffle_on_join_keys(spark):
    from vectra_py_spark.plans.entry_queries import q_big_spenders

    plan = _plan(q_big_spenders(spark, SF_ORACLE))
    # lineitem aggregates partially (1 shuffle on l_orderkey); every
    # join is broadcast; top-100 is TakeOrderedAndProject (no sort
    # exchange)
    assert _n_shuffles(plan) == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_daily_rolling_window_reuses_spine_partitioning(spark):
    from vectra_py_spark.plans.entry_queries import q_daily_rolling

    plan = _plan(q_daily_rolling(spark, SF_ORACLE))
    # shuffles: distinct types + daily agg + output range sort — the
    # RANGE-frame window must NOT add a fourth
    assert "Window" in plan, plan
    assert _n_shuffles(plan) <= 3, plan


def test_quantized_topk_single_corpus_scan_plus_broadcast_params(spark):
    from vectra_py_spark.plans.entry_queries import q_quantized_topk

    plan = _plan(q_quantized_topk(spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bm25_stats_broadcast_scoring_shuffle_free(spark):
    from vectra_py_spark.plans.entry_queries import q_bm25_topk

    plan = _plan(q_bm25_topk(spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
    # corpus-side scoring adds no hash shuffle beyond the 1-row stats agg
    assert _n_shuffles(plan) <= 1, plan
