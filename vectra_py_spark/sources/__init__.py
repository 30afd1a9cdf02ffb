"""Ingest sources and table layout: local files, web pages,
HTML→markdown conversion, JSONL/CSV corpus dumps
(:mod:`.textcorpus`), WARC crawl archives + ZIP/TAR media bundles
(:mod:`.warc`), CDX(J) crawl indexes for selective range reads
(:mod:`.cdx`), folder-of-anything document ingestion dispatching on
magic bytes (:mod:`.documents`), bucketed tables (:mod:`.bucketed`),
and small-file compaction (:mod:`.maintenance`)."""

from vectra_py_spark.sources.bucketed import read_table, write_bucketed
from vectra_py_spark.sources.cdx import (
    cdx_select,
    fetch_cdx_records,
    index_warc,
    read_cdx,
    surt_key,
)
from vectra_py_spark.sources.documents import (
    archive_documents,
    extract_any_document,
    read_archive_documents,
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
    "archive_documents",
    "read_archive_documents",
    "read_cdx",
    "cdx_select",
    "fetch_cdx_records",
    "index_warc",
    "surt_key",
]
