"""JSONL / CSV document-corpus sources with corrupt-record discipline.

Training corpora ship as JSON-lines (C4, The Pile, RedPajama dumps) or
CSV far more often than as Parquet; this module reads them into the
canonical ``documents`` schema the rest of the engine operates on.
It is the bulk-file counterpart of ``sources/fetchers.py`` (the
reference's per-URI ingestion surface,
``/root/reference/src/vectra_py/vectra-cli.py`` keys/URI-list flow):
fetchers pull individual documents, this reads corpus dumps.

Why ``spark.read.text`` + ``from_json``/``from_csv`` instead of the
native ``spark.read.json/csv`` readers: Spark refuses any plan whose
pruned scan of a raw JSON/CSV source references only the internal
corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
COLUMN) — which is exactly what ``clean.count()`` or a quarantine
aggregate compiles to after column pruning, making the obvious
quarantine API throw at a distance. Parsing explicitly over a text
scan has no such restriction, keeps both streams freely queryable,
and costs nothing extra for line-oriented corpora: the line must be
read in full either way, and the parse stays in whole-stage codegen.

Spark-first rules encoded here, each load-bearing at 100 TB:

- **Explicit schema, never inference.** Schema inference is an extra
  full pass over every byte and can silently widen types between
  runs. Callers pass (or default to) a fixed ``StructType``.
- **PERMISSIVE + corrupt column, never drop.** A malformed line in a
  crawl dump is signal (truncated shard, upstream encoding bug). Bad
  lines keep their raw text and source shard (``_corrupt``,
  ``_file``) so a quarantine sink can persist them;
  ``corrupt_splitout`` separates the streams.
- **Line-based formats split.** A directory of shards parallelizes
  per file even under gzip (not splittable within a file);
  zstd/bzip2/uncompressed split within files too. The readers take
  directories/globs, not single files, for exactly this reason.
- **No multiLine mode.** JSON arrays / quoted-newline CSV force
  whole-file parsing (one task per file regardless of codec). Corpus
  dumps should be line-records; the option is deliberately absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "DOCUMENTS_SCHEMA",
    "read_jsonl_documents",
    "read_csv_documents",
    "corrupt_splitout",
    "write_jsonl",
]

# The fixture/documents shape the operators expect (TESTDATA.md).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt"
_PARSE_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """The parse schema must itself declare the corrupt-record column —
    ``from_json``/``from_csv`` silently skip capture otherwise."""
    if _CORRUPT in schema.fieldNames():
        return schema
    return T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )


def _parse_lines(raw: DataFrame, parser) -> DataFrame:
    """Shared shape: keep shard provenance, skip blank lines, explode
    the parsed struct. Everything stays one narrow codegen'd map —
    no shuffle, no Python."""
    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            parser(F.col("value")).alias("r"),
            F.input_file_name().alias("_file"),
        )
        .select("r.*", "_file")
    )


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Read a JSON-lines corpus (possibly compressed, possibly a
    directory/glob of shards) with the explicit ``schema``. Malformed
    lines survive with their raw text in ``_corrupt`` and their shard
    in ``_file`` instead of vanishing."""
    target = _with_corrupt(schema)
    return _parse_lines(
        spark.read.text(path),
        lambda c: F.from_json(c, target, _PARSE_OPTS),
    )


def read_csv_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read a CSV corpus with the explicit ``schema``; rows that fail
    to parse land in ``_corrupt`` (raw line preserved).

    With ``header=True`` each shard's header line is dropped by exact
    match against the schema-ordered header string — shards of one
    dump share one column order by construction; a shard whose header
    differs shows up loudly as corrupt rows rather than silently
    shifted columns. The match is content-based (a line-oriented scan
    has no per-file line numbers), so a DATA line byte-identical to
    the header is treated as a header too — such a line could only
    parse under an all-string schema anyway (under the documents
    schema it would land in quarantine as a failed ``doc_id`` parse,
    which is where a dropped header would otherwise surface)."""
    target = _with_corrupt(schema)
    # from_csv takes a DDL string, not a StructType
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in target.fields
    )
    opts = dict(_PARSE_OPTS, sep=sep)
    raw = spark.read.text(path)
    if header:
        head_line = sep.join(schema.fieldNames())
        raw = raw.filter(F.col("value") != head_line)
    return _parse_lines(raw, lambda c: F.from_csv(c, ddl, opts))


def corrupt_splitout(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a parsed read into (clean rows without the bookkeeping
    columns, quarantine rows carrying the raw bad line + its shard).
    Both sides are plain filters over the same lazy scan — freely
    countable/aggregable, no materialization required."""
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT, "_file")
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT, "_file")
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    shards: int | None = None,
) -> None:
    """Write a corpus back out as JSON-lines shards (the interchange
    format downstream tokenizer/training stacks read). ``shards``
    controls output file count — at scale pick it so each shard lands
    ~100–500 MB for splittable re-reads; gzip shards stay one-task
    each on re-read, so prefer many smaller shards when compressing."""
    out = df.repartition(shards) if shards else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
