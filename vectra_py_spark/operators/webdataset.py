"""WebDataset shard export — the delivery format of the public
multimodal corpora: a training shard is a plain TAR whose members
group by sample key (``<key>.jpg`` + ``<key>.txt`` adjacent, keys in
order), so loaders stream samples sequentially with zero index
structure (Aizman et al. 2019, "High Performance I/O For Large Scale
Deep Learning"; the packaging LAION ships and img2dataset writes).
This is the export half of the image-text pipeline in pairs.py:
mine → dedup → fetch → pack; the TAR members come back through this
repo's own archive reader, closing the round trip. Reference tie-in:
the reference's export story stops at its own on-disk index
(README quickstart); training consumers want shards.

Construction mirrors ``to_wet_shards`` (sources/warc.py): documents
bucket by a deterministic key hash (reruns → identical membership),
and each shard materializes in exactly ONE ``applyInPandas`` call so
payload bytes can never depend on Arrow batch boundaries. TAR bytes
are canonical: USTAR entries with zeroed mtime/uid/gid and fixed
mode, samples in bytewise key order — two runs over the same rows
produce byte-identical shards, which makes shard-level checksums a
real replication check. One shuffle total (the shard key); size
``n_shards`` so a shard fits executor memory.
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["synth_webdataset", "to_webdataset_shards"]


def synth_webdataset(
    samples: Iterable[tuple[str, Mapping[str, bytes | str]]],
) -> bytes:
    """(key, {extension: payload}) samples → canonical WebDataset TAR
    bytes. Members are emitted as ``<key>.<ext>`` with one sample's
    members adjacent (extensions sorted within a sample, samples in
    the order given); str payloads are UTF-8 encoded. Headers are
    normalized (mtime/uid/gid 0, mode 0644, USTAR) so identical
    samples give identical bytes."""
    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as tar:
        for key, parts in samples:
            if not parts:
                raise ValueError(f"sample {key!r} has no parts")
            for ext in sorted(parts):
                data = parts[ext]
                if isinstance(data, str):
                    data = data.encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def to_webdataset_shards(
    df: DataFrame,
    columns: Mapping[str, str],
    n_shards: int = 64,
    key_col: str = "key",
) -> DataFrame:
    """Sample rows → WebDataset shard payloads (shard, payload,
    n_samples): one row per shard, TAR bytes in ``payload``.

    ``columns`` maps member extension → source column (e.g.
    ``{"jpg": "image", "txt": "caption"}``); binary columns pass
    through, string columns UTF-8-encode, NULL parts are omitted from
    the sample (a caption-only row still packs). Rows bucket by
    ``pmod(xxhash64(key), n_shards)`` — deterministic membership, no
    count job — and each shard is ONE pandas call building the
    canonical TAR via :func:`synth_webdataset`, samples in bytewise
    key order. Duplicate keys in one shard raise (two samples would
    interleave under one key — an upstream dedup bug surfaced, not
    papered over)."""
    import pandas as pd

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if not columns:
        raise ValueError("columns mapping must name at least one part")
    exts = dict(columns)

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        grp = pdf.sort_values(key_col, kind="mergesort")
        keys = [str(k) for k in grp[key_col]]
        if len(set(keys)) != len(keys):
            dup = sorted(k for k in set(keys) if keys.count(k) > 1)[0]
            raise ValueError(
                f"duplicate sample key {dup!r} in shard — dedup upstream"
            )
        samples = []
        for i, key in enumerate(keys):
            parts: dict[str, bytes | str] = {}
            for ext, col in exts.items():
                v = grp[col].iloc[i]
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                parts[ext] = bytes(v) if isinstance(
                    v, (bytes, bytearray, memoryview)
                ) else str(v)
            if parts:
                samples.append((key, parts))
        return pd.DataFrame({
            "shard": [int(grp["__shard"].iloc[0])],
            "payload": [synth_webdataset(samples)],
            "n_samples": [len(samples)],
        })

    return (
        df.select(
            key_col, *dict.fromkeys(exts.values()),
            F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                   F.lit(n_shards)).cast("int").alias("__shard"),
        )
        .groupBy("__shard")
        .applyInPandas(
            build, schema="shard INT, payload BINARY, n_samples INT"
        )
    )
