"""SparkVectorIndex — the vector index as a partitioned Parquet table.

Re-expresses the reference's ``LocalIndex``
(``/root/reference/src/vectra_py/local_index.py``) — one ``index.json``
folder fully materialized in driver memory, rewritten wholesale per
commit — as a columnar Parquet table with declared schema (SURVEY.md
§1.1, §2.1 S1–S6, §2.8 D1–D4):

- load (S1) → ``spark.read.parquet`` with a fixed schema + ``.cache()``
- create (S2) → empty DataFrame write + a meta row
- save/commit (S4) → atomic job commit (overwrite) replaces the
  copy-on-write file swap (``local_index.py:80-90``)
- metadata side-files (S5/S6) → unnecessary: columnar storage gives
  column pruning; "indexed" fields become typed top-level columns so
  predicates push into the scan
- insert/upsert/delete (D1–D3) → staged-batch union + window dedup
  (MERGE-equivalent on plain Parquet)
- query_items (V5) → filter → HOF cosine → ``orderBy().limit(k)``
  which Catalyst executes as ``TakeOrderedAndProject`` (per-partition
  heap top-k + driver merge — no full shuffle sort, strictly better
  than the reference's full sort at ``local_index.py:141``)

Scale (100 TB): items live partitioned by ``hash(id)`` bucket; the scan
parallelizes per file split; scoring is codegen'd per partition; top-k
merges k rows per partition on the driver. Metadata filters prune
row groups via Parquet min/max stats on the typed columns.
"""

from __future__ import annotations

import uuid
from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectra_py_spark.filters import compile_filter
from vectra_py_spark.functions.vector import cosine_to_query, l2_norm

__all__ = ["SparkVectorIndex", "ITEM_SCHEMA"]

# IndexItem (``custom_types.py:43-49``): id, vector, norm, metadata.
# metadata_ref (the side-file pointer, ``metadataFile``) is dropped —
# full metadata rides in the row; columnar pruning makes the split moot.
ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("vector", T.ArrayType(T.DoubleType()), nullable=False),
        T.StructField("norm", T.DoubleType(), nullable=False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _metadata_resolver(df: DataFrame):
    """Field → Column: typed top-level column when present (pushdown-able),
    else ``metadata[field]`` (the reference's non-indexed metadata)."""
    cols = set(df.columns)

    def resolve(field: str):
        if field in cols:
            return F.col(field)
        return F.col("metadata").getItem(field)

    return resolve


class SparkVectorIndex:
    """A vector index over a Parquet path (or a registered table name).

    The reference's begin/end/cancel copy-on-write protocol
    (``local_index.py:32-40,80-90``) maps to explicit staging: mutations
    accumulate in a driver-side batch and ``commit()`` runs ONE Spark
    write job (atomic by job commit). ``cancel_update`` = drop the batch.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        vector_dim: int | None = None,
        indexed_fields: Mapping[str, T.DataType] | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.vector_dim = vector_dim
        self.indexed_fields = dict(indexed_fields or {})
        self._pending: list[dict[str, Any]] = []
        self._pending_deletes: list[str] = []
        self._cached: DataFrame | None = None

    # -- schema ----------------------------------------------------------
    def _schema(self) -> T.StructType:
        fields = list(ITEM_SCHEMA.fields)
        for name, dtype in self.indexed_fields.items():
            fields.append(T.StructField(name, dtype, True))
        return T.StructType(fields)

    # -- lifecycle (S2, S3) ----------------------------------------------
    def create(self, overwrite: bool = False) -> None:
        """S2: write an empty table with the declared schema."""
        mode = "overwrite" if overwrite else "errorifexists"
        empty = self.spark.createDataFrame([], self._schema())
        empty.write.mode(mode).parquet(self.path)
        self._invalidate()

    def delete_index(self) -> None:
        """S3: drop the table (overwrite with nothing → empty dir)."""
        empty = self.spark.createDataFrame([], self._schema())
        empty.write.mode("overwrite").parquet(self.path)
        self._invalidate()

    def exists(self) -> bool:
        try:
            self.spark.read.schema(self._schema()).parquet(self.path).limit(1)
            return True
        except Exception:
            return False

    # -- load (S1) --------------------------------------------------------
    def items(self, use_cache: bool = True) -> DataFrame:
        """S1: the items DataFrame. ``cache()`` is the Spark analog of the
        reference's memoized in-memory index (``local_index.py:161-172``)."""
        if self._cached is not None:
            return self._cached
        df = self.spark.read.schema(self._schema()).parquet(self.path)
        if use_cache:
            df = df.cache()
            self._cached = df
        return df

    def _invalidate(self) -> None:
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None

    # -- mutations (D1-D4) ------------------------------------------------
    @staticmethod
    def _norm(vec: Sequence[float]) -> float:
        return float(sum(float(x) * float(x) for x in vec) ** 0.5)

    def _resolved_dim(self) -> int | None:
        """Lazily adopt the index dimension: explicit ctor arg, else the
        dimension of any committed row (one tiny head job, memoized)."""
        if self.vector_dim is None:
            head = self.items().select(F.size("vector").alias("d")).head(1)
            if head:
                self.vector_dim = int(head[0]["d"])
        return self.vector_dim

    def _stage(self, item: Mapping[str, Any]) -> dict[str, Any]:
        vec = [float(x) for x in item["vector"]]
        if self._resolved_dim() is None:
            self.vector_dim = len(vec)  # first vector defines the index dim
        if self.vector_dim is not None and len(vec) != self.vector_dim:
            # Ingest-time dimension check — improvement over the reference,
            # whose dimension is implicit and unchecked (SURVEY.md §1.2).
            raise ValueError(
                f"vector dim {len(vec)} != index dim {self.vector_dim}"
            )
        row = {
            "id": str(item.get("id") or uuid.uuid4()),
            "vector": vec,
            # A1: norm precomputed at write time (``local_index.py:209``).
            "norm": self._norm(vec),
            "metadata": {
                str(k): str(v) for k, v in (item.get("metadata") or {}).items()
            },
        }
        md = item.get("metadata") or {}
        for name in self.indexed_fields:
            row[name] = md.get(name, item.get(name))
        return row

    def insert_item(self, item: Mapping[str, Any]) -> str:
        """D1: stage an insert; duplicate ids rejected at commit."""
        row = self._stage(item)
        self._pending.append({**row, "_op": "insert"})
        return row["id"]

    def upsert_item(self, item: Mapping[str, Any]) -> str:
        """D2: stage an upsert; replaces an existing id at commit."""
        row = self._stage(item)
        self._pending.append({**row, "_op": "upsert"})
        return row["id"]

    def delete_item(self, item_id: str) -> None:
        """D3: stage a delete."""
        self._pending_deletes.append(item_id)

    def cancel_update(self) -> None:
        """D4: discard staged mutations (reference ``cancel_update``)."""
        self._pending.clear()
        self._pending_deletes.clear()

    def commit(self) -> None:
        """D4/S4: apply staged mutations in one atomic write job.

        Plain-Parquet MERGE equivalent: union(existing, staged) →
        ``row_number() over (partition by id order by is_new desc) = 1``
        (SURVEY.md §2.8 D2). On Delta this would be a real MERGE; the
        semantics are identical.
        """
        if not self._pending and not self._pending_deletes:
            return
        existing = self.items(use_cache=False)

        if self._pending:
            new_ids = {r["id"] for r in self._pending if r["_op"] == "insert"}
            if new_ids:
                clash = (
                    existing.select("id")
                    .filter(F.col("id").isin(*new_ids))
                    .limit(1)
                    .count()
                )
                if clash:
                    raise ValueError("insert_item: id already exists (unique=True)")
            staged_rows = [
                {k: v for k, v in r.items() if k != "_op"} for r in self._pending
            ]
            staged = self.spark.createDataFrame(staged_rows, self._schema())
            merged = (
                existing.withColumn("_new", F.lit(0))
                .unionByName(staged.withColumn("_new", F.lit(1)))
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("id").orderBy(F.desc("_new"))
                    ),
                )
                .filter(F.col("_rn") == 1)
                .drop("_new", "_rn")
            )
        else:
            merged = existing

        if self._pending_deletes:
            merged = merged.filter(~F.col("id").isin(*self._pending_deletes))

        # Atomic job commit: write to a staging dir then swap would be the
        # classic pattern; Spark's own output committer gives atomicity per
        # job, and we must materialize before overwriting our own input.
        out = merged.localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(self.path)
        self.cancel_update()
        self._invalidate()

    def merge_batch(self, df: DataFrame) -> None:
        """Bulk upsert a DataFrame of items — the distributed twin of
        ``upsert_item``+``commit`` for batches too large to stage on the
        driver, and the sink for streaming ingest
        (:func:`vectra_py_spark.streaming.ingest.stream_upsert` calls
        this per micro-batch).

        ``df`` needs ``id`` and ``vector``; ``norm`` is (re)computed,
        missing schema columns null-fill. Duplicate ids within the
        batch are rejected (which row should win is undefined), as are
        vectors of the wrong dimension — same ingest-time checks as the
        row-at-a-time path.
        """
        staged = df.withColumn("vector", F.col("vector").cast("array<double>"))
        dup = staged.groupBy("id").count().filter(F.col("count") > 1).limit(1)
        if dup.count():
            raise ValueError("merge_batch: duplicate id within batch")
        dim = self._resolved_dim()
        if dim is None:
            head = staged.select(F.size("vector").alias("d")).head(1)
            if head:
                self.vector_dim = dim = int(head[0]["d"])
        if dim is not None:
            bad = staged.filter(F.size("vector") != dim).limit(1)
            if bad.count():
                raise ValueError(
                    f"merge_batch: vector dimension != index dim {dim}"
                )
        staged = staged.withColumn("norm", l2_norm(F.col("vector")))
        for f in self._schema().fields:
            if f.name not in staged.columns:
                staged = staged.withColumn(f.name, F.lit(None).cast(f.dataType))
        staged = staged.select(*[f.name for f in self._schema().fields])
        merged = (
            self.items(use_cache=False).withColumn("_new", F.lit(0))
            .unionByName(staged.withColumn("_new", F.lit(1)))
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("id").orderBy(F.desc("_new"))
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_new", "_rn")
        )
        out = merged.localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(self.path)
        self._invalidate()

    # -- reads (P12-P14, A2) ---------------------------------------------
    def get_item(self, item_id: str) -> DataFrame:
        """P13: point lookup by id."""
        return self.items().filter(F.col("id") == F.lit(item_id)).limit(1)

    def list_items(self) -> DataFrame:
        """P14: all items."""
        return self.items()

    def list_items_by_metadata(self, filter_ast: Mapping[str, Any]) -> DataFrame:
        """P12: full filter scan, no ranking."""
        df = self.items()
        return df.filter(compile_filter(filter_ast, _metadata_resolver(df)))

    def get_index_stats(self) -> dict[str, Any]:
        """A2: ``{version, metadata_config, items}`` analog."""
        return {
            "version": 1,
            "metadata_config": {"indexed": sorted(self.indexed_fields)},
            "items": self.items().count(),
        }

    # -- query (V5, §3.1) -------------------------------------------------
    def query_items(
        self,
        vector: Sequence[float],
        top_k: int,
        filter_ast: Mapping[str, Any] | None = None,
        score_decimals: int | None = None,
    ) -> DataFrame:
        """V5: filter → cosine score → top-k.

        Physical plan (verify with ``.explain``): Parquet scan with pushed
        filter → codegen'd HOF cosine projection →
        ``TakeOrderedAndProject(k)``. The query vector + its norm are plan
        literals (computed once, ``local_index.py:135``). Ties broken by
        id for determinism (the reference's sort is unstable on ties).
        """
        df = self.items()
        if filter_ast:
            df = df.filter(compile_filter(filter_ast, _metadata_resolver(df)))
        score = cosine_to_query("vector", vector, norm_col="norm")
        if score_decimals is not None:
            score = F.round(score, score_decimals)
        return (
            df.withColumn("score", score)
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(top_k)
        )


def with_norm(df: DataFrame, vector_col: str = "vector") -> DataFrame:
    """A1 helper: attach the precomputed L2 norm at write time."""
    return df.withColumn("norm", l2_norm(F.col(vector_col)))
