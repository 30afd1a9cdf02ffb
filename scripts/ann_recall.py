#!/usr/bin/env python
"""Recall@k of every ANN variant vs the exact cosine top-k, at sf0.1.

Recall@k = |ANN top-k ∩ exact top-k| / k, averaged over Q query
vectors. The LSH/IVF/PQ variants here run with SEEDED (untrained)
structures — the documented stand-ins for k-means-trained cells and
codebooks — so these numbers are the floor a production deployment
improves on by training, not the ceiling.

Usage: python scripts/ann_recall.py   → one JSON line (paste→BENCH.md)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from vectra_py_spark.operators import quantize as qz  # noqa: E402
from vectra_py_spark.operators import similarity as sim  # noqa: E402
from vectra_py_spark.plans.entry_queries import (  # noqa: E402
    load,
    seeded_query_vector,
)
from vectra_py_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
K = 10
N_QUERIES = 20


def main() -> None:
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, SF_DIR, "embeddings").cache()
    emb.count()

    cb = qz.pq_codebook()
    cb_trained = qz.pq_train_codebook(emb)
    variants = {
        "lsh_topk": lambda q: sim.lsh_topk(emb, q, k=K, extra_cols=()),
        "ivf_topk(nprobe=2/8)": lambda q: sim.ivf_topk(
            emb, q, k=K, extra_cols=()
        ),
        "sq8_topk": lambda q: qz.sq8_topk(emb, q, k=K),
        "pq_topk": lambda q: qz.pq_topk(emb, q, k=K, codebook=cb),
        "ivfpq_topk(nprobe=2/8)": lambda q: qz.ivfpq_topk(
            emb, q, k=K, codebook=cb
        ),
        "pq_topk(trained)": lambda q: qz.pq_topk(
            emb, q, k=K, codebook=cb_trained
        ),
        "pq_rerank(seeded,x20)": lambda q: qz.pq_topk_rerank(
            emb, q, k=K, oversample=20, codebook=cb
        ),
        "pq_rerank(trained,x20)": lambda q: qz.pq_topk_rerank(
            emb, q, k=K, oversample=20, codebook=cb_trained
        ),
        # the BENCH.md headline rerank row — oversample x50
        "pq_rerank(trained,x50)": lambda q: qz.pq_topk_rerank(
            emb, q, k=K, oversample=50, codebook=cb_trained
        ),
    }

    hits = {name: 0 for name in variants}
    for s in range(N_QUERIES):
        q = seeded_query_vector(64, seed=500 + s)
        exact = {
            r[0] for r in sim.cosine_topk(emb, q, k=K).select("vec_id").collect()
        }
        for name, fn in variants.items():
            got = {r[0] for r in fn(q).select("vec_id").collect()}
            hits[name] += len(got & exact)

    report = {
        "sf": SF_DIR.rsplit("sf", 1)[-1],
        "k": K,
        "n_queries": N_QUERIES,
        "recall_at_k": {
            name: round(h / (K * N_QUERIES), 3) for name, h in hits.items()
        },
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
