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
    from vectra_py_spark.streaming.events import event_time_col
    t = event_time_col("ts", evd).alias("t_us")
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


def test_hybrid_search_is_one_join_no_fact_shuffle(spark):
    from vectra_py_spark.plans.entry_queries import q_hybrid_search

    plan = _plan(q_hybrid_search(spark, SF_ORACLE))
    # corpus-side shuffles: only the BM25 stats singleton + spread's
    # round-robin; scoring/fusion joins are broadcast, top-k is
    # TakeOrderedAndProject
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_waiting_suppliers_min_max_aggs_not_expand(spark):
    from vectra_py_spark.plans.entry_queries import q_waiting_suppliers

    plan = _plan(q_waiting_suppliers(spark, SF_ORACLE))
    # the count_distinct formulation plans Expand + 2 exchanges per agg
    # (5 total); the min/max formulation needs 3 plain hash aggs
    assert "Expand" not in plan, plan
    assert _n_shuffles(plan) <= 3, plan


def test_frequent_tokens_one_exchange_with_partial_agg(spark):
    from vectra_py_spark.operators.text_analysis import frequent_tokens

    plan = _plan(frequent_tokens(load(spark, SF_ORACLE, "documents")))
    assert _n_shuffles(plan) == 1, plan
    assert "partial_count" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_disjunctive_revenue_broadcast_part_no_fact_shuffle(spark):
    from vectra_py_spark.plans.entry_queries import q_disjunctive_revenue

    plan = _plan(q_disjunctive_revenue(spark, SF_ORACLE))
    # lineitem never shuffles: part dim broadcasts, agg is global
    # (single partition exchange only)
    assert _n_shuffles(plan) == 0, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bloom_membership_stays_in_codegen(spark):
    from vectra_py_spark.operators.splits import (
        BLOOM_M_BITS,
        bloom_membership_expr,
    )

    df = spark.createDataFrame(
        [("a b c",)], "shingle: string"
    ).crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [([0] * (BLOOM_M_BITS // 64),)], "bloom: array<bigint>"
            )
        )
    )
    plan = _plan(df.filter(F.expr(bloom_membership_expr())))
    # membership test compiles to JVM expressions (xxhash64/shiftright
    # in the plan), never a Python eval node
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "xxhash64" in plan and "shiftright" in plan, plan


def test_clean_corpus_single_scan_single_exchange(spark):
    from vectra_py_spark.plans.entry_queries import q_clean_corpus

    plan = _plan(q_clean_corpus(spark, SF_ORACLE))
    # all three text signals compose as expressions over ONE corpus
    # scan; survivorship is the only exchange (window on text hash)
    assert plan.count("FileScan") == 1, plan
    assert _n_shuffles(plan) == 1, plan


def test_label_centroids_partial_agg_no_codegen_bomb(spark):
    from vectra_py_spark.operators.similarity import group_centroids

    plan = _plan(group_centroids(load(spark, SF_ORACLE, "embeddings")))
    # posexplode + groupBy(group, pos) with map-side partials — not the
    # 2-dim-wide one-shot aggregate (the BENCH.md codegen bomb)
    assert "partial_sum" in plan, plan
    assert "Generate posexplode" in plan or "posexplode" in plan, plan


# --------------------------------------------------------------------------
# Round-3 relational sweep shapes (plans/relational.py)
# --------------------------------------------------------------------------
def test_forecast_revenue_zero_shuffle_scan_agg(spark):
    from vectra_py_spark.plans.relational import q_forecast_revenue

    plan = _plan(q_forecast_revenue(spark, SF_ORACLE))
    # pure scan-filter-agg: partial sum map-side, single-partition final
    # — no hash exchange, no join, and the date bounds reach the scan
    assert _n_shuffles(plan) == 0, plan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1][:400], plan


def test_product_profit_dims_broadcast_one_group_exchange(spark):
    from vectra_py_spark.plans.relational import q_product_profit

    plan = _plan(q_product_profit(spark, SF_ORACLE))
    # part/supplier/nation (and orders at this SF) broadcast into the
    # lineitem scan; the only hash exchange is the (nation, year) agg
    assert _n_shuffles(plan) == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_min_cost_supplier_ids_only_distinct_then_window(spark):
    from vectra_py_spark.plans.relational import q_min_cost_supplier

    plan = _plan(q_min_cost_supplier(spark, SF_ORACLE))
    # two inherent exchanges: the (part, supplier) id distinct and the
    # window min on partkey; dims broadcast, facts never sort-merge
    assert _n_shuffles(plan) == 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_top_supplier_argmax_broadcasts_back(spark):
    from vectra_py_spark.plans.relational import q_top_supplier

    plan = _plan(q_top_supplier(spark, SF_ORACLE))
    # suppkey agg + global-window max over the tiny aggregate: the fact
    # scans ONCE (no rev self-join), supplier dim broadcasts
    assert plan.count("FileScan parquet") == 2, plan  # lineitem + supplier
    assert "SortMergeJoin" not in plan, plan


def test_excess_suppliers_semi_join_chain_no_fact_key_shuffle(spark):
    from vectra_py_spark.plans.relational import q_excess_suppliers

    plan = _plan(q_excess_suppliers(spark, SF_ORACLE))
    # part keys broadcast-semi into the date-pruned scan; the
    # (supp, part) agg is the only fact exchange; supplier join is
    # broadcast-semi
    assert "SortMergeJoin" not in plan, plan
    assert _n_shuffles(plan) <= 2, plan


# --------------------------------------------------------------------------
# Round-2 continuation query shapes
# --------------------------------------------------------------------------
def test_semantic_dedup_single_cell_exchange(spark):
    from vectra_py_spark.plans.entry_queries import q_semantic_dedup

    plan = _plan(q_semantic_dedup(spark, SF_ORACLE))
    # cell assignment is a projection: the prune path costs ONE hash
    # exchange on cell (plus the anti-join's broadcast of dropped ids)
    assert "BroadcastExchange" in plan, plan


def test_lm_quality_model_broadcasts(spark):
    from vectra_py_spark.plans.entry_queries import q_lm_quality

    plan = _plan(q_lm_quality(spark, SF_ORACLE))
    # vocab freq + 1-row total both re-enter broadcast: the token
    # stream is never hash-shuffled on token
    assert plan.count("BroadcastExchange") >= 2, plan


def test_bpe_pair_counts_vocab_sized_exchanges(spark):
    from vectra_py_spark.plans.entry_queries import q_bpe_pair_counts

    plan = _plan(q_bpe_pair_counts(spark, SF_ORACLE))
    # word count + pair count + TakeOrdered: both aggregates partial
    assert _n_shuffles(plan) == 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_concat_chunk_offsets_broadcast_back(spark):
    from vectra_py_spark.plans.entry_queries import q_concat_chunk

    plan = _plan(q_concat_chunk(spark, SF_ORACLE))
    # shard offsets come back as a broadcast, not a corpus re-shuffle
    assert "BroadcastExchange" in plan, plan


def test_padding_efficiency_one_bucket_exchange(spark):
    from vectra_py_spark.plans.entry_queries import q_padding_efficiency

    plan = _plan(q_padding_efficiency(spark, SF_ORACLE))
    # window + groupBy share ONE bucket hash exchange (no exchange
    # between the Window and the aggregate); the second is the output
    # orderBy's range partitioning
    assert _n_shuffles(plan) == 2, plan
    assert "Exchange hashpartitioning(bucket" in plan, plan


def test_phash_neardup_shuffles_fingerprints_only(spark):
    """The banded Hamming join shuffles (id, 3×int64) block rows on
    the (block_idx, block_val) keys — payloads never enter the plan;
    the verify is codegen'd bit ops (no Python past the hash pass)."""
    from vectra_py_spark.operators.imagehash import phash_neardup_pairs

    hashes = spark.createDataFrame(
        [(f"m{i}", (i * 2654435761) % (1 << 63)) for i in range(50)],
        ["media_id", "phash"],
    )
    plan = _plan(phash_neardup_pairs(hashes, radius=7))
    assert "block_idx" in plan and "bit_count" in plan, plan
    assert "ArrowEvalPython" not in plan and "mapInPandas" not in plan.lower(), plan


def test_audio_match_one_join_one_offset_aggregate(spark):
    """audio_match_pairs = equi-join on the hash + ONE (pair, offset)
    hash aggregate + the per-pair window — fingerprint-sized, no
    Python, no cartesian."""
    from vectra_py_spark.operators.audiofp import audio_match_pairs

    fp = spark.createDataFrame(
        [(f"c{i % 4}", (i * 11400714819323198485) % (1 << 62), i % 40, None)
         for i in range(200)],
        "media_id STRING, hash BIGINT, t INT, error STRING",
    )
    plan = _plan(audio_match_pairs(fp, min_matches=3))
    assert "CartesianProduct" not in plan, plan
    assert "ArrowEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan, plan


def test_bitext_matmul_corpus_never_shuffles(spark):
    """margin_bitext_mine's matmul strategy: the corpus-sized relations
    reach the k-NN passes through (at most) one round-robin spread —
    no hash/range shuffle of vectors; all joins after the passes are
    candidate-sized, with the neighborhood means broadcast."""
    from vectra_py_spark.operators.similarity import margin_bitext_mine

    import numpy as np

    rng = np.random.default_rng(3)
    src = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(40)],
        ["vec_id", "embedding"],
    )
    tgt = spark.createDataFrame(
        [(100 + i, rng.normal(size=8).tolist()) for i in range(40)],
        ["vec_id", "embedding"],
    )
    out = margin_bitext_mine(src, tgt, k=3, strategy="matmul")
    plan = _plan(out)
    assert "BroadcastExchange" in plan, plan  # nn means ship broadcast
    # hash shuffles appear only on candidate-sized relations (the
    # best-margin windows / intersection join), never on `embedding`
    for m in re.finditer(
        r"Exchange hashpartitioning\(([^)]*)\)", plan
    ):
        assert "embedding" not in m.group(1), plan


def test_video_match_shuffles_frame_hashes_only(spark):
    """video_match_pairs = banded block equi-join on frame hashes +
    codegen'd bit_count verify + ONE (pair, offset) aggregate + the
    per-pair window — (id, 3×int64) rows only, no cartesian, no Python
    past the hash pass."""
    from vectra_py_spark.operators.videohash import video_match_pairs

    fh = spark.createDataFrame(
        [(f"v{i % 5}", i % 12, (i * 2654435761) % (1 << 62), None)
         for i in range(120)],
        "media_id STRING, frame_idx INT, phash BIGINT, error STRING",
    )
    plan = _plan(video_match_pairs(fh, radius=7, min_aligned=2))
    assert "CartesianProduct" not in plan, plan
    assert "block_idx" in plan and "bit_count" in plan, plan
    assert "ArrowEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan, plan
