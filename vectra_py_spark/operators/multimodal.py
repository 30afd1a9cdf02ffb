"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``BINARY`` columns with a modality tag and a
metadata map — the Spark-side contract (schema, partitioning, Arrow
batch shape, UDF signatures) is real and tested; the actual
decode/resize/frame-sample steps are STUBBED (no image/audio libs in
this container) behind :data:`DECODERS`, each raising
``NotImplementedError`` unless a deterministic fake is requested.

Scale notes: binary payloads dominate row size — keep them OUT of
shuffles (extract features first, then drop/park the payload column);
``spark.sql.files.maxPartitionBytes`` sizes scan splits, and
``arrow.maxRecordsPerBatch`` must shrink when payloads are MBs so an
Arrow batch stays in worker memory. Feature extraction is a narrow
``mapInPandas`` — linear scale-out, no state.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_binary_payload",
    "extract_features",
    "decode_stub",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),  # opaque payload
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 16


def decode_stub(modality: str, payload: bytes) -> None:
    """Where a real decoder would go (PIL / torchaudio / pyav). The
    container ships none of them; the plumbing around this stub — batch
    shape, schema, null handling — is the tested surface."""
    raise NotImplementedError(
        f"no {modality} decoder in this environment; install the codec "
        "library and register it in DECODERS"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding: md5-seeded
    buckets over the raw bytes. Lets the full pipeline (ingest → feature
    → similarity) run hermetically."""
    vec = [0.0] * dim
    digest = hashlib.md5(payload or b"").digest()
    for i, byte in enumerate(digest):
        vec[i % dim] += (byte - 127.5) / 127.5
    norm = sum(x * x for x in vec) ** 0.5 or 1.0
    return [x / norm for x in vec]


DECODERS = {"fake": _fake_features}


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", modality: str = "image"
) -> DataFrame:
    """Test-fixture adapter: treat a text column's UTF-8 bytes as an
    opaque payload so the binary plumbing exercises real data shapes."""
    return df.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        F.create_map(
            F.lit("n_bytes"), F.octet_length(F.encode(F.col(text_col), "UTF-8"))
            .cast("string")
        ).alias("meta"),
    )


def extract_features(
    df: DataFrame,
    decoder: str = "fake",
    data_col: str = "data",
    id_col: str = "media_id",
) -> DataFrame:
    """Binary payloads → fixed-dim feature vectors via ``mapInPandas``.

    With ``decoder='fake'`` the deterministic byte-hash features run
    end-to-end; any other name resolves through :data:`DECODERS` and
    raises ``NotImplementedError`` until a real codec is registered.
    """
    if decoder not in DECODERS:
        decode_stub(decoder, b"")  # raises with a clear message
    fn = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fn(bytes(b) if b is not None else b"") for b in pdf[data_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "n_bytes": [
                        len(bytes(b)) if b is not None else 0
                        for b in pdf[data_col]
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(
        run, schema="media_id STRING, n_bytes BIGINT, features ARRAY<DOUBLE>"
    )
