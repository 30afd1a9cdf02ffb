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
    fm = np.array([cos[i, fwd_nn[i]].mean() for i in range(len(s_ids))])
    bm = np.array([cos[bwd_nn[j], j].mean() for j in range(len(t_ids))])

    def margin(i, j):
        return _round_half_away(
            np.array(cos[i, j] / ((fm[i] + bm[j]) / 2.0))
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
