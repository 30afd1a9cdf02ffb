"""Ingest sources and table layout: local files, web pages,
HTML→markdown conversion, JSONL/CSV corpus dumps
(:mod:`.textcorpus`), WARC crawl archives + ZIP/TAR media bundles
(:mod:`.warc`), folder-of-anything document ingestion dispatching on
magic bytes (:mod:`.documents`), bucketed tables (:mod:`.bucketed`),
and small-file compaction (:mod:`.maintenance`)."""

from vectra_py_spark.sources.bucketed import read_table, write_bucketed
from vectra_py_spark.sources.documents import (
    extract_any_document,
    read_documents,
)
from vectra_py_spark.sources.fetchers import (
    FileFetcher,
    WebFetcher,
    fetch_directory_df,
    html_to_markdown,
)
from vectra_py_spark.sources.maintenance import compact_parquet
from vectra_py_spark.sources.warc import (
    parse_warc,
    read_media_archive,
    read_warc,
    warc_documents,
)
from vectra_py_spark.sources.textcorpus import (
    corrupt_splitout,
    read_csv_documents,
    read_jsonl_documents,
    write_jsonl,
)

__all__ = [
    "FileFetcher",
    "WebFetcher",
    "fetch_directory_df",
    "html_to_markdown",
    "read_table",
    "write_bucketed",
    "compact_parquet",
    "read_jsonl_documents",
    "read_csv_documents",
    "corrupt_splitout",
    "write_jsonl",
    "parse_warc",
    "read_warc",
    "read_media_archive",
    "warc_documents",
    "extract_any_document",
    "read_documents",
]
