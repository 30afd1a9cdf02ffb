#!/usr/bin/env python
"""sf1-scale stress run of the near-dup family (VERDICT r1 #8).

The driver ships fixtures up to sf0.1 (5k documents / 2k embeddings).
This script generates a 10x corpus (50k documents / 20k embeddings) with
the same schema, length distribution, and planted-dup structure, then
times the near-dup operators at BOTH scales in one session and reports
the scaling ratio: a scale-correct operator should cost <= ~2x its
10x-extrapolated sf0.1 time (banding joins are near-linear in rows at
fixed threshold; candidate volume is the thing to watch, so it's
reported too).

Usage: python scripts/stress_sf1.py   (writes /tmp/vectra_stress_sf1)
Output: one JSON line; paste the numbers into BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from vectra_py_spark.plans.entry_queries import (  # noqa: E402
    QUERIES,
    RETIRED_QUERIES,
    q_lsh_neardup_demo,
)

# demoted/retired from the registry (VERDICT r6 item 6 / r10 item 2)
# but still stress-measured — retirement releases a driver-window slot,
# not the scale evidence
QUERIES = {**QUERIES, **RETIRED_QUERIES, "lsh_neardup_demo": q_lsh_neardup_demo}
from vectra_py_spark.session import get_spark  # noqa: E402

SF01_DIR = "/root/testdata/sf0.1"
SF1_DIR = "/tmp/vectra_stress_sf1"
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64

VOCAB = (
    "spark table query join filter group agg sort scan hash merge stream "
    "batch vector column line part order value key fast slow big small "
    "the a customer plan shuffle broadcast partition index"
).split()

STRESS_QUERIES = [
    "exact_dedup",
    "minhash_lsh_neardup",
    "simhash_neardup",
    "lsh_neardup_demo",
    "embedding_neardup",
    # round-2 document/vector operators (narrow maps / broadcast-agg
    # shapes — expected well under linear)
    "repetition_signals",
    "bm25_topk",
    "quantized_topk",
    "ivf_topk",
    # late-round-2 operators: fused retrieval, bitmap-prefiltered
    # decontamination, heavy-hitters, one-scan curation, index probe
    "hybrid_search",
    "bloom_decontaminate",
    "frequent_tokens",
    "ngram_diversity",
    "clean_corpus",
    "minhash_probe",
    "label_centroids",
    # round-2 continuation: cell-bounded semantic dedup, incremental
    # batch-vs-corpus dedup, LM scorer + quantile cut, stats card, JL
    "semantic_dedup",
    "incremental_dedup",
    "lm_quality",
    "lm_quality_cut",
    "corpus_stats",
    "random_projection",
    "bigram_lm_quality",
    "dup_shingle_ratio",
    "source_token_drift",
    "temperature_mix",
    "concat_chunk",
    "padding_efficiency",
    "bpe_pair_counts",
    "cross_source_dups",
    "leakage_safe_split",
    # round-3: dedup-aware sampling/encoding/clustering additions
    "dsir_weights",
    "curriculum_order",
    "duplicate_ngram_spans",
    "nb_quality_score",
    "tokenize_ids",
    "lloyd_kmeans",
    "tfidf_top_terms",
    "pmi_collocations",
    "seq_len_histogram",
    "winnow_fingerprints",
    "winnow_matches",
    "winnow_probe",
    "winnow_contamination",
    # round-4: curation filters, mixing planner, PQ ANN
    "gopher_quality",
    "c4_line_stats",
    "line_dedup",
    "length_trim",
    "unimax_mix",
    "domain_mix",
    "oov_rate",
    "pq_topk",
    "nfc_normalize",
    "ivfpq_topk",
    "curation_funnel",
    "label_outliers",
    "word_entropy",
    "dup_rate_by_source",
    "pq_rerank",
    "corpus_diff",
    "content_checksum",
    "bm25_probe",
    "embedding_coverage",
    "tokenizer_fertility",
    "span_cut",
    "encoding_report",
    "bm25_batch_probe",
    "hybrid_probe",
    # round-5: production-threshold LSH (linear output; banding prunes)
    # and the post-ADVICE AQE-planned sizes join
    "lsh_neardup_strict",
    "neardup_weights",
    "lang_confusion",
    "quality_calibration",
    "ivf_cell_balance",
    "typo_neardup_terms",
    "source_overlap",
    # round-6: real JPEG codec e2e (narrow mapInPandas; per-row cost
    # bounded by the synthesized image, independent of corpus size)
    "jpeg_roundtrip",
    # round-6: BPE training loop (one corpus scan; rounds run on the
    # capped vocab table — 10× corpus should barely move it) and its
    # apply side (same shape + one vocab-sized aggregate)
    "bpe_train_rounds",
    "bpe_vocab_usage",
    # round-7: the splitter oracle regime (narrow mapInPandas, rows
    # scale with corpus), MJPEG-in-AVI sampling and FLAC round-trip
    # (both doc_id-bounded — flat by construction, the honest contract
    # for synthesized-codec e2e entries)
    "chunk_spans_simple",
    "mjpeg_sample",
    "mp4_sample",
    "flac_roundtrip",
    "media_probe",
    "audio_pipeline",
    "warc_extract",
    "warc_documents",
    "media_triage",
    "pdf_extract",
    # round-9: office/legacy extraction e2e (nine encoders + dispatch
    # per doc; doc_id-bounded synth but the extract stage scales with
    # matching rows — same narrow-mapInPandas contract)
    "office_documents",
]


def generate(spark) -> None:
    rng = np.random.default_rng(20260813)
    rows = []
    for i in range(N_DOCS):
        n_words = int(rng.integers(8, 90))
        words = list(rng.choice(VOCAB, size=n_words))
        rows.append(words)
    # planted structure, mirroring the fixture: ~0.2% exact dups and a
    # sprinkle of near-dups (1-2 word edits)
    for i in range(0, N_DOCS, 500):
        rows[i + 1] = list(rows[i])  # exact dup
    for i in range(2, N_DOCS, 500):
        nd = list(rows[i])
        nd[len(nd) // 2] = "vector" if nd[len(nd) // 2] != "vector" else "table"
        rows[i + 3] = nd  # near-dup
    langs = ["en", "en", "en", "zh", "fr", "de"]
    docs = [
        (
            i,
            " ".join(w),
            langs[int(rng.integers(0, len(langs)))],
            f"src{i % 10}",
            len(" ".join(w)),
        )
        for i, w in enumerate(rows)
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).repartition(32).write.mode("overwrite").parquet(f"{SF1_DIR}/documents.parquet")

    V = rng.standard_normal((N_VECS, DIM)).astype(np.float32)
    for i in range(0, N_VECS, 50):  # planted near-dup vector pairs
        j = i + 1
        V[j] = V[i] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
    vecs = [
        (i, [float(x) for x in V[i]], int(i % 10)) for i in range(N_VECS)
    ]
    spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    ).repartition(32).write.mode("overwrite").parquet(f"{SF1_DIR}/embeddings.parquet")


def main() -> None:
    spark = get_spark("vectra-stress-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)

    # argv names → stress only that subset (fast re-measures of new
    # entries without the full 70-query session); no args = full list
    unknown = [n for n in sys.argv[1:] if n not in QUERIES]
    if unknown:  # a typo must not silently trigger the full-list run
        raise SystemExit(f"unknown query name(s): {unknown}")
    queries = sys.argv[1:] or STRESS_QUERIES
    report: dict = {"n_docs": N_DOCS, "n_vecs": N_VECS, "queries": {}}
    for name in queries:
        fn = QUERIES[name]
        # count(), not collect(): pair cardinality + wall time is the
        # metric; collecting millions of pairs to the driver would just
        # re-measure driver serialization (and trips maxResultSize on
        # the 16-bit simhash variant, which saturates by the birthday
        # bound at this corpus size — reported honestly via sf1_pairs).
        fn(spark, SF01_DIR).count()  # warm both plans
        t0 = time.perf_counter()
        small = fn(spark, SF01_DIR).count()
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        big = fn(spark, SF1_DIR).count()
        t_big = time.perf_counter() - t0
        # docs queries scale 10x in rows; embeddings queries too
        ratio_vs_linear = t_big / (10.0 * t_small) if t_small else None
        report["queries"][name] = {
            "sf0.1_sec": round(t_small, 2),
            "sf1_sec": round(t_big, 2),
            "sf0.1_pairs": small,
            "sf1_pairs": big,
            "vs_10x_extrapolated": round(ratio_vs_linear, 2),
        }
        print(f"# {name}: {report['queries'][name]}", file=sys.stderr)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
