"""Unit semantics for near-dup clustering
(`vectra_py_spark.operators.cluster`) — cross-engine parity is covered
by `test_entry_oracle.py` (neardup_clusters entry)."""


from __future__ import annotations

import pytest

from vectra_py_spark.operators.cluster import (
    connected_components,
    neardup_clusters,
)


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_connected_components_chain_triangle_pair(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["comp"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_connected_components_max_iter_bounds_work(spark):
    # a 6-node path needs ~5 propagation rounds; max_iter=2 must still
    # return a labelling (possibly unconverged) without error
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    full = {
        r["node"]: r["comp"]
        for r in connected_components(edges, max_iter=10).collect()
    }
    assert set(full.values()) == {1}


@pytest.mark.slow
def test_neardup_clusters_survivor_longest_then_smallest_id(spark):
    docs = spark.createDataFrame(
        [
            # near-dup trio: 1 & 2 identical text, 3 is longer superset
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta epsilon zeta eta"),
            # unrelated doc
            (9, "totally different content with many words here"),
        ],
        "doc_id long, text string",
    )
    rows = neardup_clusters(docs, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cluster_id"] == 1
    assert r["size"] == 3
    assert r["survivor_id"] == 3  # longest text wins


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_leakage_safe_split_keeps_clusters_together(spark):
    from vectra_py_spark.operators.cluster import leakage_safe_split

    # 1-2-3 one near-dup chain; 10 and 20 singletons
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),
        (2, base + " iota"),
        (3, base + " kappa"),
        (10, "totally different words entirely here now"),
        (20, "other unrelated content lives in this doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in leakage_safe_split(df, threshold=0.5).collect()}
    assert len(out) == 5
    # the whole chain shares one cluster id and thus one split
    assert out[1].cluster_id == out[2].cluster_id == out[3].cluster_id == 1
    assert out[1].split == out[2].split == out[3].split
    # singletons are their own clusters
    assert out[10].cluster_id == 10 and out[20].cluster_id == 20


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_neardup_weights_cluster_atomic(spark):
    from vectra_py_spark.operators.cluster import neardup_weights

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the creek"),
        (3, "completely unrelated text about spark shuffles and catalyst"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in neardup_weights(df).collect()}
    assert out[1].cluster_id == out[2].cluster_id
    assert out[1].cluster_size == 2 and out[1].weight == 0.5
    assert out[3].cluster_size == 1 and out[3].weight == 1.0
    # expected members per epoch == number of clusters
    assert abs(sum(r.weight for r in out.values()) - 2.0) < 1e-6
