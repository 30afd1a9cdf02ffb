"""Large-scale data-pipeline operators (beyond the reference's surface).

The reference is a single-process vector store; these are the operators a
100 TB training-data pipeline needs on top of its semantics: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine) with
near-dup clustering + survivor selection (:mod:`.cluster`), similarity
search (brute-force exact + LSH/IVF ANN + batched serving), text
analysis (language id, quality, token stats, fingerprints),
deterministic splits / stratified sampling / decontamination /
per-source quotas (:mod:`.splits`), epoch-weighted mixing
(:mod:`.mixing`), as-of + range temporal joins (:mod:`.asof`), sketch
aggregations (:mod:`.sketches`), skew mitigation (:mod:`.skew`),
SQ8 embedding quantization (:mod:`.quantize`), BM25 full-text ranking
(:mod:`.ranking`), sequence packing (:mod:`.packing`), multimodal
binary column plumbing, and the post-training layer — SFT
conversation parsing/validation/dedup/rendering (:mod:`.chat`),
preference-pair hygiene + Bradley–Terry fits (:mod:`.preference`),
and BLEU/ROUGE/chrF generation eval (:mod:`.geneval`).
Everything SQL-expressible is built from JVM-side
``pyspark.sql.functions`` only — no Python in the hot path.
"""
