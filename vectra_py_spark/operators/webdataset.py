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
real replication check. One shuffle total (the shard key). Sizing is
either a fixed ``n_shards`` (caller owns shard size) or — the
corpus-scale mode — ``max_samples_per_shard`` / ``max_shard_bytes``,
where the shard count derives from the data (img2dataset's
convention) and the bound is enforced exactly by in-bucket greedy
splitting, so a 100 TB export can never build a multi-GB TAR in one
task because someone forgot a count.
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


_TAR_BLOCK = 512
_TAR_RECORD = 10240  # tarfile pads archives to full 10 KiB records
_TAR_EOF = 2 * _TAR_BLOCK  # two zero blocks terminate the archive


def _member_footprint(n: int) -> int:
    """On-disk bytes one TAR member of ``n`` content bytes occupies:
    one header block + content padded to a block boundary."""
    return _TAR_BLOCK + ((n + _TAR_BLOCK - 1) // _TAR_BLOCK) * _TAR_BLOCK


def _archive_size(member_bytes: int) -> int:
    """Exact TAR archive size for ``member_bytes`` of member
    footprints: members + EOF blocks, padded to a full record."""
    raw = member_bytes + _TAR_EOF
    return ((raw + _TAR_RECORD - 1) // _TAR_RECORD) * _TAR_RECORD


def to_webdataset_shards(
    df: DataFrame,
    columns: Mapping[str, str],
    n_shards: int | None = None,
    key_col: str = "key",
    *,
    max_samples_per_shard: int | None = None,
    max_shard_bytes: int | None = None,
) -> DataFrame:
    """Sample rows → WebDataset shard payloads (shard, subshard,
    payload, n_samples): TAR bytes in ``payload``, one row per
    (shard, subshard) — ``subshard`` is 0 unless a size bound split a
    bucket (below).

    ``columns`` maps member extension → source column (e.g.
    ``{"jpg": "image", "txt": "caption"}``); binary columns pass
    through, string columns UTF-8-encode, NULL parts are omitted from
    the sample (a caption-only row still packs). Rows bucket by
    ``pmod(xxhash64(key), G)`` — deterministic membership — and each
    bucket is ONE pandas call building canonical TARs via
    :func:`synth_webdataset`, samples in bytewise key order (the key
    is cast to STRING before bucketing and sorting, so member order
    always matches the emitted ``<key>.<ext>`` names, integer keys
    included). Duplicate keys in one bucket raise (two samples would
    interleave under one key — an upstream dedup bug surfaced, not
    papered over). ``key_col`` must not double as a part column: the
    member name and a member payload coming from one column is a
    caller mistake, refused up front.

    Sizing — at least one of the three must be given:

    - ``n_shards``: fixed bucket count, the caller owns shard size.
      Appropriate for tests and small exports; at corpus scale a fixed
      count means per-task TAR builds that grow with the data (the
      executor-OOM shape), so prefer the bounds below.
    - ``max_samples_per_shard`` / ``max_shard_bytes``: the
      img2dataset convention — shard COUNT derives from the data (one
      lightweight aggregate job estimates rows/bytes, so mean bucket
      size ≈ the bound and per-task memory stays flat at any corpus
      size), and the bound is then enforced EXACTLY inside each
      bucket: samples are greedy-packed in key order into as many
      ``subshard`` TARs as needed, each holding ≤ max_samples_per_shard
      samples and ≤ max_shard_bytes of finished TAR bytes (a single
      sample larger than the byte bound gets a subshard of its own —
      it cannot be split). ``max_shard_bytes`` bounds the REAL payload
      length (header/padding/EOF accounting included), not just the
      content sum. Both may be combined, and either may be combined
      with ``n_shards`` (fixed count, bounds still enforced by
      splitting).

    One shuffle total (the bucket key). Reruns over the same rows
    produce byte-identical shards — membership is a key hash, packing
    order is the key sort, and bounds are arithmetic on sizes — so
    shard-level checksums remain a real replication check."""
    import pandas as pd

    if n_shards is None and max_samples_per_shard is None \
            and max_shard_bytes is None:
        raise ValueError(
            "size the export: pass n_shards (fixed count) or "
            "max_samples_per_shard / max_shard_bytes (derived count, "
            "bounded shards — the 100 TB-safe modes)"
        )
    if n_shards is not None and n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if max_samples_per_shard is not None and max_samples_per_shard < 1:
        raise ValueError(
            f"max_samples_per_shard must be >= 1, got "
            f"{max_samples_per_shard}"
        )
    if max_shard_bytes is not None and max_shard_bytes < _TAR_RECORD:
        raise ValueError(
            f"max_shard_bytes must be >= {_TAR_RECORD} (one TAR "
            f"record — the smallest possible shard), got "
            f"{max_shard_bytes}"
        )
    if not columns:
        raise ValueError("columns mapping must name at least one part")
    if key_col in columns.values():
        raise ValueError(
            f"key_col {key_col!r} also appears as a part column in "
            f"`columns` — the sample key cannot double as a payload"
        )
    exts = dict(columns)

    # Member-content length per part column (NULL → 0): strings
    # measure their UTF-8 encoding, matching what packs into the TAR.
    def _part_len(col: str):
        c = F.col(col)
        return F.when(
            c.isNull(), F.lit(0)
        ).otherwise(F.octet_length(c.cast("binary"))).cast("long")

    n_buckets = n_shards
    if n_buckets is None:
        # Derived count (img2dataset's convention): one aggregate job
        # sizes the corpus so mean bucket ≈ the bound; the in-bucket
        # greedy split below then makes the bound exact under skew.
        footprints = [
            (F.lit(_TAR_BLOCK)
             + F.ceil(_part_len(c) / _TAR_BLOCK) * _TAR_BLOCK)
            * F.when(F.col(c).isNotNull(), F.lit(1)).otherwise(F.lit(0))
            for c in dict.fromkeys(exts.values())
        ]
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                sum(footprints[1:], footprints[0]).cast("long")
            ).alias("b"),
        ).collect()[0]
        n_rows, total_bytes = agg["n"] or 0, agg["b"] or 0
        n_buckets = 1
        if max_samples_per_shard is not None:
            n_buckets = max(
                n_buckets, -(-n_rows // max_samples_per_shard)
            )
        if max_shard_bytes is not None:
            n_buckets = max(
                n_buckets, -(-total_bytes // max_shard_bytes) or 1
            )

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        grp = pdf.sort_values(key_col, kind="mergesort")
        keys = list(grp[key_col])
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

        # Greedy split in key order: close the open subshard when the
        # next sample would break either bound (exact TAR arithmetic,
        # so the REAL payload length obeys max_shard_bytes).
        groups: list[list] = [[]]
        cur_members = 0
        for key, parts in samples:
            sample_members = sum(
                _member_footprint(
                    len(v.encode("utf-8")) if isinstance(v, str) else len(v)
                )
                for v in parts.values()
            )
            over_n = (
                max_samples_per_shard is not None
                and len(groups[-1]) >= max_samples_per_shard
            )
            over_b = (
                max_shard_bytes is not None
                and groups[-1]
                and _archive_size(cur_members + sample_members)
                > max_shard_bytes
            )
            if over_n or over_b:
                groups.append([])
                cur_members = 0
            groups[-1].append((key, parts))
            cur_members += sample_members

        shard_id = int(grp["__shard"].iloc[0])
        rows = [
            (shard_id, sub, synth_webdataset(g), len(g))
            for sub, g in enumerate(groups) if g
        ] or [(shard_id, 0, synth_webdataset([]), 0)]
        return pd.DataFrame(
            rows, columns=["shard", "subshard", "payload", "n_samples"]
        )

    return (
        df.select(
            F.col(key_col).cast("string").alias(key_col),
            *dict.fromkeys(exts.values()),
            F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                   F.lit(n_buckets)).cast("int").alias("__shard"),
        )
        .groupBy("__shard")
        .applyInPandas(
            build,
            schema="shard INT, subshard INT, payload BINARY, "
                   "n_samples INT",
        )
    )
