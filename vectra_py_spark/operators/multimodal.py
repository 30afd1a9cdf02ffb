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
    "resize_media",
    "sample_frames",
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


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resampler: md5-keyed byte
    stream of exactly width·height bytes (a real one returns w·h·C
    pixels; the plumbing cares about sizes and determinism, not
    pixels)."""
    target = width * height
    digest = hashlib.md5(payload or b"").digest()
    reps = target // len(digest) + 1
    return (digest * reps)[:target]


RESIZERS = {"fake": _fake_resize}


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    resizer: str = "fake",
    data_col: str = "data",
) -> DataFrame:
    """Payload → fixed-size payload, preserving the MEDIA_SCHEMA shape
    so resize composes with :func:`extract_features` / sinks.

    A real implementation swaps :data:`RESIZERS` entries (PIL/libvips);
    the Spark contract — narrow ``mapInPandas``, payload stays out of
    any shuffle, meta records the output dims — is identical. Arrow
    batch sizing: at w·h·C ≈ MBs per row, set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch stays
    ≲ worker heap (documented, not enforced here).
    """
    if resizer not in RESIZERS:
        decode_stub(resizer, b"")
    fn = RESIZERS[resizer]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[data_col] = [
                fn(bytes(b) if b is not None else b"", width, height)
                for b in pdf[data_col]
            ]
            out["meta"] = [
                {**(m or {}), "out_w": str(width), "out_h": str(height)}
                for m in pdf["meta"]
            ]
            yield out

    return df.mapInPandas(run, schema=df.schema)


def sample_frames(
    df: DataFrame,
    n_frames: int,
    data_col: str = "data",
    id_col: str = "media_id",
) -> DataFrame:
    """Video-style frame sampling: ONE payload row → ``n_frames`` rows,
    frame i = the byte slice [L·i/n, L·(i+1)/n) of the payload (a real
    sampler decodes and picks keyframes; the slice boundaries stand in
    deterministically and reconstruct the payload exactly when
    concatenated — unit-tested).

    Plan shape: a row-exploding narrow ``mapInPandas`` — the multimodal
    analog of ``explode`` — with NO shuffle; downstream per-frame
    operators (resize, features) chain onto it still shuffle-free.
    Frame payloads inherit the payload-out-of-shuffle rule; the
    byte-boundary arithmetic (floor(L·i/n)) is integer-exact, which is
    what makes the operator oracle-checkable end-to-end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, b in zip(pdf[id_col], pdf[data_col]):
                payload = bytes(b) if b is not None else b""
                length = len(payload)
                for i in range(n_frames):
                    lo = length * i // n_frames
                    hi = length * (i + 1) // n_frames
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[lo:hi])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_bytes": [len(x) for x in frames],
                }
            )

    return df.mapInPandas(
        run,
        schema="media_id STRING, frame_idx INT, frame BINARY, n_bytes BIGINT",
    )
