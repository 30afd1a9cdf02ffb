"""Margin-based bitext mining (`operators/similarity.py::
margin_bitext_mine` — Artetxe & Schwenk 2019 ratio margin): planted
parallel pairs, dense-numpy reference parity, matmul/hof strategy
equivalence, forward vs intersection semantics, and the DuckDB twin.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from vectra_py_spark.operators.similarity import (
    _DP,
    _round_half_away,
    margin_bitext_mine,
    margin_bitext_mine_sql,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

K = 3


def _corpora(seed: int = 7, n_src: int = 24, n_tgt: int = 26, dim: int = 8):
    """Random vectors with PLANTED parallel pairs: src i and tgt i+100
    share a direction (tiny noise) for i in 0..5 — those must mine out;
    the rest are independent noise."""
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(n_src, dim))
    tgt = rng.normal(size=(n_tgt, dim))
    for i in range(6):
        tgt[i] = src[i] + rng.normal(scale=0.01, size=dim)
    return (
        [(i, src[i].tolist()) for i in range(n_src)],
        [(100 + j, tgt[j].tolist()) for j in range(n_tgt)],
    )


def _reference(src_rows, tgt_rows, k: int, direction: str,
               threshold: float):
    """Independent dense-numpy implementation of the documented
    semantics: rounded cosines, k-NN by (cos desc, id asc), ratio
    margin, argmax by (rounded margin desc, id asc)."""
    s_ids = np.array([r[0] for r in src_rows])
    t_ids = np.array([r[0] for r in tgt_rows])
    S = np.array([r[1] for r in src_rows], dtype=np.float64)
    T = np.array([r[1] for r in tgt_rows], dtype=np.float64)
    S = S / np.linalg.norm(S, axis=1)[:, None]
    T = T / np.linalg.norm(T, axis=1)[:, None]
    cos = _round_half_away(S @ T.T)
    kf, kb = min(k, len(t_ids)), min(k, len(s_ids))

    def knn(row_vals, other_ids, kk):
        order = np.lexsort((other_ids, -row_vals))[:kk]
        return order

    fwd_nn = [knn(cos[i], t_ids, kf) for i in range(len(s_ids))]
    bwd_nn = [knn(cos[:, j], s_ids, kb) for j in range(len(t_ids))]
    # neighborhoods as exact integer sums of the 1e6-scaled cosines;
    # margin = one division of exact integers (the operator's
    # documented cross-engine-reproducible semantics)
    ci = np.rint(cos * 10.0 ** _DP).astype(np.int64)
    fsum = np.array([ci[i, fwd_nn[i]].sum() for i in range(len(s_ids))])
    bsum = np.array([ci[bwd_nn[j], j].sum() for j in range(len(t_ids))])

    def margin(i, j):
        den = fsum[i] * kb + bsum[j] * kf
        if den == 0:
            return 0.0
        return _round_half_away(
            np.array(2.0 * ci[i, j] * kf * kb / den)
        ).item()

    fbest = {}
    for i in range(len(s_ids)):
        cands = sorted(
            ((-margin(i, j), t_ids[j], j) for j in fwd_nn[i])
        )
        _, _, j = cands[0]
        fbest[(i, j)] = (s_ids[i], t_ids[j], cos[i, j], margin(i, j))
    if direction == "forward":
        keep = fbest
    else:
        bbest = set()
        for j in range(len(t_ids)):
            cands = sorted(
                ((-margin(i, j), s_ids[i], i) for i in bwd_nn[j])
            )
            _, _, i = cands[0]
            bbest.add((i, j))
        keep = {p: v for p, v in fbest.items() if p in bbest}
    return {
        (a, b): (c, m) for a, b, c, m in keep.values() if m >= threshold
    }


@pytest.mark.parametrize("strategy", ["matmul", "hof"])
def test_margin_mine_matches_dense_reference(spark, strategy):
    src_rows, tgt_rows = _corpora()
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    got = {
        (r.id_src, r.id_tgt): (r.cosine, r.margin)
        for r in margin_bitext_mine(
            src, tgt, k=K, threshold=1.0, strategy=strategy
        ).collect()
    }
    want = _reference(src_rows, tgt_rows, K, "intersection", 1.0)
    assert got.keys() == want.keys()
    for p, (c, m) in want.items():
        assert got[p][0] == pytest.approx(c, abs=10 ** -_DP)
        assert got[p][1] == pytest.approx(m, abs=10 ** -_DP)
    # the planted parallel pairs must be among the mined pairs
    assert {(i, 100 + i) for i in range(6)} <= got.keys()


def test_margin_mine_forward_superset_of_intersection(spark):
    src_rows, tgt_rows = _corpora(seed=11)
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    inter = {
        (r.id_src, r.id_tgt)
        for r in margin_bitext_mine(src, tgt, k=K, threshold=0.0).collect()
    }
    fwd = {
        (r.id_src, r.id_tgt)
        for r in margin_bitext_mine(
            src, tgt, k=K, threshold=0.0, direction="forward"
        ).collect()
    }
    assert inter <= fwd
    assert len(fwd) == len(src_rows)  # one best candidate per source row


def test_margin_mine_duckdb_twin(spark):
    src_rows, tgt_rows = _corpora(seed=23)
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    for direction in ("forward", "intersection"):
        got = sorted(
            (r.id_src, r.id_tgt, r.cosine, r.margin)
            for r in margin_bitext_mine(
                src, tgt, k=K, threshold=1.0, direction=direction
            ).collect()
        )
        con = duckdb.connect()
        rel = (
            "SELECT * FROM (VALUES {}) AS t(vec_id, embedding)"
        )
        def lit(rows):
            return ", ".join(
                f"({i}, {v}::DOUBLE[])" for i, v in rows
            )
        sql = margin_bitext_mine_sql(
            rel.format(lit(src_rows)), rel.format(lit(tgt_rows)),
            k=K, threshold=1.0, direction=direction,
        )
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert [(a, b) for a, b, *_ in got] == [
            (a, b) for a, b, *_ in want
        ]
        for g, w in zip(got, want):
            assert g[2] == pytest.approx(w[2], abs=10 ** -_DP)
            assert g[3] == pytest.approx(w[3], abs=10 ** -_DP)


def test_margin_mine_k_exceeds_side(spark):
    """k larger than the target side: neighborhoods truncate to the
    available rows, nothing crashes, every source still mines its
    best candidate."""
    src = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    tgt = spark.createDataFrame(
        [(10, [1.0, 0.1])], ["vec_id", "embedding"]
    )
    rows = margin_bitext_mine(
        src, tgt, k=5, threshold=0.0, direction="forward"
    ).collect()
    assert {r.id_tgt for r in rows} == {10}
    assert len(rows) == 2


def test_margin_mine_validation(spark):
    df = spark.createDataFrame([(0, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        margin_bitext_mine(df, df, k=0)
    with pytest.raises(ValueError):
        margin_bitext_mine(df, df, direction="both")
    with pytest.raises(ValueError):
        margin_bitext_mine(df, df, strategy="gpu")


def test_margin_mine_rejects_non_integral_ids(spark):
    """ADVICE r10: string/UUID ids used to work on hof but crash
    mid-stage under auto/matmul (int64 coercion). The contract is now
    validated up front on EVERY strategy, so the strategies can't
    diverge."""
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])], ["vec_id", "embedding"]
    )
    for strategy in ("auto", "matmul", "hof"):
        with pytest.raises(ValueError, match="integral"):
            margin_bitext_mine(df, df, k=1, strategy=strategy)
    missing = spark.createDataFrame([(0, [1.0])], ["other", "embedding"])
    with pytest.raises(ValueError, match="no column"):
        margin_bitext_mine(missing, missing, k=1)


def test_margin_mine_zero_vector_strategy_parity(spark):
    """ADVICE r10: a zero-norm vector must score cosine 0.0 (never
    0/0 = NaN) on BOTH strategies, and the rounded-before-margin means
    keep the outputs identical."""
    src_rows, tgt_rows = _corpora(seed=31, n_src=10, n_tgt=12)
    src_rows[3] = (src_rows[3][0], [0.0] * 8)   # planted zero vectors
    tgt_rows[5] = (tgt_rows[5][0], [0.0] * 8)
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    outs = {}
    for strategy in ("matmul", "hof"):
        rows = margin_bitext_mine(
            src, tgt, k=K, threshold=0.0, direction="forward",
            strategy=strategy,
        ).collect()
        for r in rows:
            assert r.cosine is not None and not np.isnan(r.cosine), strategy
            assert r.margin is not None and not np.isnan(r.margin), strategy
        outs[strategy] = sorted(
            (r.id_src, r.id_tgt, r.cosine, r.margin) for r in rows
        )
    assert outs["matmul"] == outs["hof"]
    # every source row (including the zero vector) mines a candidate
    assert len(outs["matmul"]) == len(src_rows)


def test_margin_mine_sharded_1x1_equals_matmul(spark):
    from vectra_py_spark.operators.similarity import (
        margin_bitext_mine_sharded,
    )

    src_rows, tgt_rows = _corpora(seed=43)
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    base = sorted(
        (r.id_src, r.id_tgt, r.cosine, r.margin)
        for r in margin_bitext_mine(
            src, tgt, k=K, threshold=1.0, strategy="matmul"
        ).collect()
    )
    sharded = sorted(
        (r.id_src, r.id_tgt, r.cosine, r.margin)
        for r in margin_bitext_mine_sharded(
            src, tgt, src_shards=1, tgt_shards=1, k=K, threshold=1.0
        ).collect()
    )
    assert sharded == base


@pytest.mark.parametrize("assign", ["hash", "mod"])
def test_margin_mine_sharded_2x2_equals_manual_loop(spark, assign):
    """The sharded driver must be EXACTLY the loop the budget refusal
    recommends: per-shard-pair matmul mining with shard-level margins,
    unioned (VERDICT r10 item 6's equivalence gate)."""
    from pyspark.sql import functions as F

    from vectra_py_spark.operators.similarity import (
        _shard_pred,
        margin_bitext_mine_sharded,
    )

    src_rows, tgt_rows = _corpora(seed=47, n_src=20, n_tgt=22)
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    manual = []
    for i in range(2):
        s_i = src.filter(_shard_pred("vec_id", 2, i, assign))
        for j in range(2):
            t_j = tgt.filter(_shard_pred("vec_id", 2, j, assign))
            manual.extend(
                (r.id_src, r.id_tgt, r.cosine, r.margin)
                for r in margin_bitext_mine(
                    s_i, t_j, k=K, threshold=1.0, strategy="matmul"
                ).collect()
            )
    got = sorted(
        (r.id_src, r.id_tgt, r.cosine, r.margin)
        for r in margin_bitext_mine_sharded(
            src, tgt, src_shards=2, tgt_shards=2, k=K, threshold=1.0,
            assign=assign,
        ).collect()
    )
    assert got == sorted(manual)
    assert len(got) > 0


def test_margin_mine_sharded_duckdb_twin(spark):
    """Cross-engine: the sharded driver with assign='mod' hash-matches
    its DuckDB twin on a 2×2 grid (the pre-staged r12 oracle shape)."""
    from vectra_py_spark.operators.similarity import (
        margin_bitext_mine_sharded,
        margin_bitext_mine_sharded_sql,
    )

    src_rows, tgt_rows = _corpora(seed=53)
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    got = sorted(
        (r.id_src, r.id_tgt, r.cosine, r.margin)
        for r in margin_bitext_mine_sharded(
            src, tgt, src_shards=2, tgt_shards=2, k=K, threshold=1.0,
            assign="mod",
        ).collect()
    )
    con = duckdb.connect()
    rel = "SELECT * FROM (VALUES {}) AS t(vec_id, embedding)"

    def lit(rows):
        return ", ".join(f"({i}, {v}::DOUBLE[])" for i, v in rows)

    sql = margin_bitext_mine_sharded_sql(
        rel.format(lit(src_rows)), rel.format(lit(tgt_rows)),
        src_shards=2, tgt_shards=2, k=K, threshold=1.0,
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert [(a, b) for a, b, *_ in got] == [(a, b) for a, b, *_ in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=10 ** -_DP)
        assert g[3] == pytest.approx(w[3], abs=10 ** -_DP)


def test_margin_mine_sharded_validation(spark):
    from vectra_py_spark.operators.similarity import (
        margin_bitext_mine_sharded,
    )

    df = spark.createDataFrame([(0, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="shard counts"):
        margin_bitext_mine_sharded(df, df, src_shards=0)
    with pytest.raises(ValueError, match="assign"):
        margin_bitext_mine_sharded(df, df, assign="range")


def test_margin_mine_auto_refuses_past_budget(spark):
    """auto must never silently plan the quadratic cross join: shrink
    the budget below the vector set and expect guidance."""
    from vectra_py_spark.operators.similarity import BROADCAST_BYTES_CONF

    src_rows, tgt_rows = _corpora()
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    old = spark.conf.get(BROADCAST_BYTES_CONF, None)
    spark.conf.set(BROADCAST_BYTES_CONF, "1")
    try:
        with pytest.raises(ValueError, match="shard|Shard"):
            margin_bitext_mine(src, tgt, k=K)
        with pytest.raises(ValueError, match="broadcast budget"):
            margin_bitext_mine(src, tgt, k=K, strategy="matmul")
    finally:
        if old is None:
            spark.conf.unset(BROADCAST_BYTES_CONF)
        else:
            spark.conf.set(BROADCAST_BYTES_CONF, old)
