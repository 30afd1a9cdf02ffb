"""Embedding providers (SURVEY.md §2.7 E1–E5) + the Spark embed stage.

The reference has two providers behind one interface
(``custom_types.py:5-10``): OpenAI/Azure REST
(``openai_embeddings.py:63-133``, 8,000-token batch budget, 429 retry
policy ``[2000, 5000]`` ms) and an "OSS" provider that *intends*
sentence-transformers but actually returns tokenizer ids
(``oss_embeddings.py:56-72``, SURVEY.md §2.9.6). We implement the
interface with:

- :class:`DeterministicEmbedder` — seeded hash → fixed-dim unit vector.
  Hermetic (no network, no model download), deterministic across
  processes; load-bearing for CI and the DuckDB oracle checks
  (SURVEY.md §5.4).
- :class:`OpenAIEmbedder` — the REST provider with the reference's
  batch budget + retry taxonomy, import-gated on ``requests``.
- :class:`SentenceTransformerEmbedder` — the intended OSS provider,
  import-gated (not installed here).

Spark-side, :func:`embed_chunks` is ``mapInPandas``: token-budget
batching (A6) happens inside the worker — a greedy running-sum pack to
``max_tokens`` per request exactly like
``local_document_index.py:156-171`` — so one HTTP/model call serves one
batch, and partitions parallelize calls without driver coordination.
"""

from __future__ import annotations

import hashlib
import math
import re
import time
from collections.abc import Iterator, Sequence
from typing import Protocol

from pyspark.sql import functions as F

__all__ = [
    "EmbeddingsProvider",
    "DeterministicEmbedder",
    "OpenAIEmbedder",
    "SentenceTransformerEmbedder",
    "embed_chunks",
    "scrub_newlines",
    "token_budget_batch_ids",
    "token_budget_batch_ids_sql",
]

DEFAULT_MAX_TOKENS = 8000  # E4: both reference providers
DEFAULT_RETRY_POLICY_MS = [2000, 5000]  # E2


class EmbeddingsProvider(Protocol):
    max_tokens: int

    def create_embeddings(self, texts: Sequence[str]) -> list[list[float]]: ...


def scrub_newlines(text: str) -> str:
    """T9: newline scrub before embedding (``local_document_index.py:168,228``)."""
    return text.replace("\n", " ")


class DeterministicEmbedder:
    """Seeded hash-based embedder: text → fixed-dim L2-normalized vector.

    Word-level hashing (bag of hashed words accumulated into buckets)
    so near-duplicate texts get near vectors — which keeps similarity
    ranking meaningful in tests, unlike a pure text-hash.
    """

    def __init__(self, dim: int = 64, seed: int = 42) -> None:
        self.dim = dim
        self.seed = seed
        self.max_tokens = DEFAULT_MAX_TOKENS

    def _word_vec(self, word: str) -> tuple[int, float]:
        digest = hashlib.md5(f"{self.seed}:{word}".encode()).digest()
        bucket = int.from_bytes(digest[:4], "big") % self.dim
        sign = 1.0 if digest[4] & 1 else -1.0
        return bucket, sign

    def embed_one(self, text: str) -> list[float]:
        vec = [0.0] * self.dim
        for word in re.findall(r"\w+", text.lower()):
            bucket, sign = self._word_vec(word)
            vec[bucket] += sign
        norm = math.sqrt(sum(x * x for x in vec))
        if norm == 0.0:
            vec[0] = 1.0
            return vec
        return [x / norm for x in vec]

    def create_embeddings(self, texts: Sequence[str]) -> list[list[float]]:
        return [self.embed_one(t) for t in texts]


class OpenAIEmbedder:
    """E1/E2: OpenAI/Azure REST embeddings with the reference's retry
    taxonomy (429 → sleep ``retry_policy[i]`` ms, ≤ len(policy) tries;
    ``openai_embeddings.py:110-133``). Import-gated on ``requests``."""

    def __init__(
        self,
        api_key: str,
        model: str = "text-embedding-ada-002",
        endpoint: str = "https://api.openai.com/v1/embeddings",
        retry_policy_ms: Sequence[int] | None = None,
        max_tokens: int = DEFAULT_MAX_TOKENS,
    ) -> None:
        self.api_key = api_key
        self.model = model
        self.endpoint = endpoint
        self.retry_policy_ms = list(retry_policy_ms or DEFAULT_RETRY_POLICY_MS)
        self.max_tokens = max_tokens

    def create_embeddings(self, texts: Sequence[str]) -> list[list[float]]:
        import requests

        attempt = 0
        while True:
            resp = requests.post(
                self.endpoint,
                headers={
                    "Authorization": f"Bearer {self.api_key}",
                    "Content-Type": "application/json",
                },
                json={"model": self.model, "input": list(texts)},
                timeout=60,
            )
            if resp.status_code == 429 and attempt < len(self.retry_policy_ms):
                time.sleep(self.retry_policy_ms[attempt] / 1000.0)
                attempt += 1
                continue
            resp.raise_for_status()
            data = resp.json()["data"]
            return [d["embedding"] for d in data]


class SentenceTransformerEmbedder:
    """E3 *intent*: true dense vectors from sentence-transformers
    (the reference shipped token ids instead, §2.9.6). Import-gated —
    raises ImportError here; the Spark plumbing is identical to the
    deterministic provider."""

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2"):
        from sentence_transformers import SentenceTransformer  # noqa: F401

        self._model = SentenceTransformer(model_name)
        self.max_tokens = DEFAULT_MAX_TOKENS

    def create_embeddings(self, texts: Sequence[str]) -> list[list[float]]:
        return [list(map(float, v)) for v in self._model.encode(list(texts))]


def _token_budget_batches(
    texts: list[str], counts: list[int], max_tokens: int
) -> Iterator[list[int]]:
    """A6: greedy running-sum batch assignment
    (``local_document_index.py:156-171``)."""
    batch: list[int] = []
    total = 0
    for i, c in enumerate(counts):
        if batch and total + c > max_tokens:
            yield batch
            batch, total = [], 0
        batch.append(i)
        total += c
    if batch:
        yield batch


def token_budget_batch_ids(
    df,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2000,
):
    """A6 as a first-class DataFrame op: assign each row the greedy
    token-budget batch it would be embedded in
    (``local_document_index.py:156-171`` — batch breaks when adding the
    next text would exceed ``max_tokens``; an oversized single text still
    gets its own batch).

    Token counting (whitespace split) stays JVM-side; only the
    inherently-sequential greedy scan runs in Python, per group via
    ``applyInPandas`` — groups pack independently, so this scales with
    group cardinality (at 100 TB: group = ingest partition/day).
    Greedy-with-reset is NOT ``floor(cumsum/budget)``; the oracle twin
    is a recursive CTE (:func:`token_budget_batch_ids_sql`).
    """
    import pandas as pd

    counted = df.select(
        F.col(group_col).alias("grp"),
        F.col(order_col).alias("ord"),
        F.size(F.split(F.col(text_col), r"\s+")).alias("n_tokens"),
    )

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ord").reset_index(drop=True)
        batch, total = 0, 0
        out = []
        for c in pdf["n_tokens"]:
            c = int(c)
            if total > 0 and total + c > max_tokens:
                batch += 1
                total = 0
            out.append(batch)
            total += c
        pdf["batch_id"] = out
        return pdf

    return (
        counted.groupBy("grp")
        .applyInPandas(assign, schema="grp string, ord bigint, n_tokens int, batch_id int")
        .select(
            F.col("grp").alias(group_col),
            F.col("ord").alias(order_col),
            "n_tokens",
            "batch_id",
        )
        .orderBy(group_col, order_col)
    )


def token_budget_batch_ids_sql(
    table: str = "documents",
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2000,
) -> str:
    """DuckDB twin of :func:`token_budget_batch_ids`: the greedy scan as
    a recursive CTE stepping row-by-row within each group."""
    return rf"""
        WITH RECURSIVE numbered AS (
            SELECT {group_col} AS grp, {order_col} AS ord,
                   CAST(len(string_split_regex({text_col}, '\s+')) AS INT)
                       AS n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY {group_col}
                                      ORDER BY {order_col}) AS rn
            FROM {table}
        ),
        r AS (
            SELECT grp, ord, n_tokens, rn, n_tokens AS acc, 0 AS batch_id
            FROM numbered WHERE rn = 1
            UNION ALL
            SELECT n.grp, n.ord, n.n_tokens, n.rn,
                   CASE WHEN r.acc + n.n_tokens > {max_tokens}
                        THEN n.n_tokens ELSE r.acc + n.n_tokens END,
                   CASE WHEN r.acc + n.n_tokens > {max_tokens}
                        THEN r.batch_id + 1 ELSE r.batch_id END
            FROM numbered n JOIN r ON n.grp = r.grp AND n.rn = r.rn + 1
        )
        SELECT grp AS {group_col}, ord AS {order_col}, n_tokens, batch_id
        FROM r
        ORDER BY {group_col}, {order_col}
    """


def embed_chunks(
    df,
    text_col: str = "text",
    n_tokens_col: str | None = "n_tokens",
    out_col: str = "vector",
    provider_factory=None,
    dim: int = 64,
):
    """chunks → chunks + ``vector ARRAY<DOUBLE>`` + ``norm DOUBLE``.

    ``provider_factory`` builds the provider *inside the executor*
    (lazy per-worker init — model/session objects never pickled).
    Batching to the provider's token budget happens per Arrow batch.
    """
    import pandas as pd

    factory = provider_factory or (lambda: DeterministicEmbedder(dim=dim))
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out_col} ARRAY<DOUBLE>, norm DOUBLE"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        provider = factory()
        for pdf in batches:
            texts = [scrub_newlines(str(t)) for t in pdf[text_col].fillna("")]
            if n_tokens_col and n_tokens_col in pdf.columns:
                counts = [int(c) for c in pdf[n_tokens_col]]
            else:
                counts = [max(1, len(t) // 6) for t in texts]
            vectors: list[list[float] | None] = [None] * len(texts)
            for batch_idx in _token_budget_batches(texts, counts, provider.max_tokens):
                embedded = provider.create_embeddings([texts[i] for i in batch_idx])
                for i, v in zip(batch_idx, embedded):
                    vectors[i] = [float(x) for x in v]
            out = pdf.copy()
            out[out_col] = vectors
            out["norm"] = [
                math.sqrt(sum(x * x for x in v)) if v else 0.0 for v in vectors
            ]
            yield out

    return df.mapInPandas(run, schema=schema)
