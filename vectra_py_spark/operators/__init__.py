"""Large-scale data-pipeline operators (beyond the reference's surface).

The reference is a single-process vector store; these are the operators a
100 TB training-data pipeline needs on top of its semantics: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force exact + LSH-bucketed ANN), text analysis
(language id, quality, token stats, fingerprints), and multimodal binary
column plumbing. Everything SQL-expressible is built from JVM-side
``pyspark.sql.functions`` only — no Python in the hot path.
"""
