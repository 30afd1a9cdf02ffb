"""Retrieval evaluation (`operators/evalmetrics.py`): hand-computed
metric values, tie-breaks, the drop-unjudged-queries convention, the
macro summary's integer-unit arithmetic, and the broadcast plan."""

import math

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.evalmetrics import (
    retrieval_metrics,
    retrieval_summary,
)

RUNS = [
    # q1: d1 > d5 > d2 > d4 > d3 by score
    ("q1", "d1", 0.9), ("q1", "d5", 0.8), ("q1", "d2", 0.7),
    ("q1", "d4", 0.6), ("q1", "d3", 0.5),
    # q2: judged only with rel=0 → dropped from the output
    ("q2", "d1", 0.9),
    # q3: relevant doc at rank 2
    ("q3", "d8", 0.9), ("q3", "d7", 0.5),
    # q4: appears in runs but has NO qrels row at all → dropped
    ("q4", "d1", 0.9),
]
QRELS = [
    ("q1", "d1", 2), ("q1", "d2", 1), ("q1", "d3", 1), ("q1", "d9", 1),
    ("q2", "d1", 0),
    ("q3", "d7", 1),
]


def _frames(spark):
    runs = spark.createDataFrame(RUNS, ["query_id", "doc_id", "score"])
    qrels = spark.createDataFrame(QRELS, ["query_id", "doc_id", "rel"])
    return runs, qrels


def test_hand_computed_metrics(spark):
    runs, qrels = _frames(spark)
    out = {r.query_id: r for r in retrieval_metrics(runs, qrels, k=3).collect()}
    assert set(out) == {"q1", "q3"}  # q2 (only rel=0) and q4 dropped

    q1 = out["q1"]
    assert q1.n_rel == 4 and q1.rel_at_k == 2
    assert q1.precision_at_k == pytest.approx(2 / 3)
    assert q1.recall_at_k == 0.5
    assert q1.rr_at_k == 1.0
    # top3 = d1(rel2,r1), d5(rel0,r2), d2(rel1,r3)
    assert q1.dcg_at_k == pytest.approx(3.0 + 1.0 / 2.0, abs=1e-6)
    # ideal top3 = rel 2,1,1
    idcg = 3.0 + 1.0 / math.log2(3) + 0.5
    assert q1.idcg_at_k == pytest.approx(idcg, abs=1e-6)
    assert q1.ndcg_at_k == pytest.approx(3.5 / idcg, abs=1e-6)

    q3 = out["q3"]
    assert q3.n_rel == 1 and q3.rel_at_k == 1
    assert q3.recall_at_k == 1.0
    assert q3.rr_at_k == 0.5
    assert q3.dcg_at_k == pytest.approx(1.0 / math.log2(3), abs=1e-6)
    assert q3.idcg_at_k == 1.0
    assert q3.ndcg_at_k == pytest.approx(1.0 / math.log2(3), abs=1e-6)


def test_k_cuts_and_unretrieved_relevant(spark):
    runs, qrels = _frames(spark)
    (q1,) = [
        r for r in retrieval_metrics(runs, qrels, k=2).collect()
        if r.query_id == "q1"
    ]
    # top2 = d1, d5 → only d1 relevant; d9 never retrieved at any k
    assert q1.rel_at_k == 1
    assert q1.precision_at_k == 0.5
    assert q1.recall_at_k == 0.25
    # ideal top2 = rel 2,1
    assert q1.idcg_at_k == pytest.approx(3.0 + 1.0 / math.log2(3), abs=1e-6)


def test_score_tie_breaks_on_doc_id(spark):
    runs = spark.createDataFrame(
        [("q", "dB", 1.0), ("q", "dA", 1.0)], ["query_id", "doc_id", "score"]
    )
    qrels = spark.createDataFrame([("q", "dA", 1)], ["query_id", "doc_id", "rel"])
    (r,) = retrieval_metrics(runs, qrels, k=2).collect()
    assert r.rr_at_k == 1.0  # dA wins the tie → rank 1


def test_summary_integer_units(spark):
    runs, qrels = _frames(spark)
    per_q = retrieval_metrics(runs, qrels, k=3)
    (s,) = retrieval_summary(per_q).collect()
    assert s.n_queries == 2
    assert s.mean_recall == pytest.approx((0.5 + 1.0) / 2)
    assert s.mrr == pytest.approx((1.0 + 0.5) / 2)
    assert s.mean_precision == pytest.approx((2 / 3 + 1 / 3) / 2, abs=1e-6)
    # means are exact 1e-6-unit integers over one division
    assert s.mean_recall == 0.75 and s.mrr == 0.75


def test_plan_broadcasts_qrels(spark):
    """The run side is the 100-TB side: the qrels join and the ideal
    join must broadcast; the only run-side shuffle is the rank
    window's."""
    runs, qrels = _frames(spark)
    plan = (
        retrieval_metrics(runs, qrels, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


@pytest.mark.slow  # 6 ANN collects — full-suite tier
def test_engine_grades_its_own_ann(spark):
    """The composition the module exists for: the engine's own ANN
    (ivf_topk) evaluated against its own exact search (cosine_topk)
    as qrels, through retrieval_metrics — recall@k here IS the number
    scripts/ann_recall.py reports, now as one DataFrame op."""
    from pyspark.sql import functions as F

    from vectra_py_spark.operators import similarity as sim
    from vectra_py_spark.plans.entry_queries import (
        load, seeded_query_vector,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").cache()
    k, runs, qrels, manual_hits = 10, [], [], 0
    for s in range(3):
        q = seeded_query_vector(64, seed=500 + s)
        ann = {
            r.vec_id: r.score
            for r in sim.ivf_topk(emb, q, k=k, extra_cols=()).collect()
        }
        exact = [
            r.vec_id for r in sim.cosine_topk(emb, q, k=k).collect()
        ]
        manual_hits += len(set(ann) & set(exact))
        runs += [(f"q{s}", str(v), float(sc)) for v, sc in ann.items()]
        qrels += [(f"q{s}", str(v), 1) for v in exact]
    per_q = retrieval_metrics(
        spark.createDataFrame(runs, ["query_id", "doc_id", "score"]),
        spark.createDataFrame(qrels, ["query_id", "doc_id", "rel"]),
        k=k,
    )
    (s_row,) = retrieval_summary(per_q).collect()
    assert s_row.n_queries == 3
    assert s_row.mean_recall == pytest.approx(manual_hits / (3 * k))
    assert 0.0 <= s_row.mean_ndcg <= 1.0
    emb.unpersist()


@pytest.mark.slow
def test_duplicate_qrels_collapse_to_max_grade(spark):
    """trec_eval rejects duplicate (query, doc) judgments; here they
    collapse to the MAX grade instead of fanning out the run join and
    double-counting (ADVICE r11: precision_at_k could exceed 1.0)."""
    runs, qrels = _frames(spark)
    dup = qrels.union(
        spark.createDataFrame(
            [("q1", "d1", 1), ("q1", "d2", 1), ("q3", "d7", 1)],
            ["query_id", "doc_id", "rel"],
        )
    )
    base = {r.query_id: r for r in retrieval_metrics(runs, qrels).collect()}
    got = {r.query_id: r for r in retrieval_metrics(runs, dup).collect()}
    # ("q1","d1") keeps its max grade 2; all metrics identical
    assert got.keys() == base.keys()
    for qid in base:
        assert got[qid] == base[qid], qid
    assert all(r.precision_at_k <= 1.0 for r in got.values())
