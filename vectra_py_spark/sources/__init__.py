"""Ingest sources: local files, web pages, HTML→markdown conversion."""

from vectra_py_spark.sources.fetchers import (
    FileFetcher,
    WebFetcher,
    fetch_directory_df,
    html_to_markdown,
)

__all__ = ["FileFetcher", "WebFetcher", "fetch_directory_df", "html_to_markdown"]
