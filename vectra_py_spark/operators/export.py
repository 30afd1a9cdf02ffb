"""Training-data export: deterministic pseudo-shuffle into balanced
shards — the materialization step at the end of a curation pipeline
(what a dataloader actually reads).

Training wants (a) documents decorrelated from ingest order, (b) shards
of near-equal size for even dataloader workers, (c) bit-reproducible
reruns (resumable exports, debuggable runs). An RNG shuffle gives up
(c); a hash of the id gives all three: ``shard = pmod(xxhash64(id,
salt), n)`` decorrelates like a shuffle, balances like a uniform hash,
and is a pure projection.

100 TB design: ONE exchange (repartition on the shard key — this IS
the export's data movement, there is no cheaper correct shuffle), then
within-partition sort by the SECOND hash so intra-shard order is also
decorrelated and deterministic (``sortWithinPartitions`` — no extra
exchange, feeds parquet row-group locality). ``partitionBy(shard)``
writes one directory per shard for the dataloader; the manifest is a
driver-side JSON of per-shard row counts computed from the SAME frame.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["export_shards"]


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "export:v1",
) -> dict:
    """Write ``df`` into ``n_shards`` hash-balanced shard directories
    under ``path`` plus a ``_manifest.json`` (underscore prefix: invisible to Spark/Hadoop dataset readers, like ``_SUCCESS``); returns the manifest.

    Same input + same salt ⇒ byte-identical shard membership and
    intra-shard order on every rerun (bump the salt for a fresh
    shuffle epoch).
    """
    shard = F.pmod(
        F.xxhash64(F.col(id_col).cast("string"), F.lit(salt)),
        F.lit(n_shards),
    ).cast("int")
    order = F.xxhash64(F.col(id_col).cast("string"), F.lit(salt + ":o"))
    staged = (
        df.withColumn("shard", shard)
        .withColumn("__o", order)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__o")
        .drop("__o")
    )
    staged.write.mode("overwrite").partitionBy("shard").parquet(path)
    rows = (
        staged.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    manifest = {
        "n_shards": n_shards,
        "salt": salt,
        "total_rows": int(sum(r.n for r in rows)),
        "shards": {int(r.shard): int(r.n) for r in sorted(rows)},
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
