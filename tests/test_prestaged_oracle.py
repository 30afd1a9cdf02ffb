"""Pre-staged round-10 registry entries, validated through the
driver's exact compare harness BEFORE they enter the window — so the
round-10 rotation adds them with evidence already in hand."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_harness import compare  # noqa: E402

from vectra_py_spark.plans.entry_queries import (  # noqa: E402
    _sql_host_pagerank,
    _sql_main_content,
    _sql_page_metadata,
    _sql_recrawl_priority,
    q_host_pagerank,
    q_main_content,
    q_page_metadata,
    q_recrawl_priority,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_recrawl_priority_oracle(spark, sf_dir):
    ok, detail = compare(
        spark, sf_dir, q_recrawl_priority(spark, sf_dir),
        _sql_recrawl_priority(),
    )
    assert ok, detail


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_host_pagerank_oracle(spark, sf_dir):
    ok, detail = compare(
        spark, sf_dir, q_host_pagerank(spark, sf_dir),
        _sql_host_pagerank(),
    )
    assert ok, detail


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_main_content_oracle(spark, sf_dir):
    ok, detail = compare(
        spark, sf_dir, q_main_content(spark, sf_dir),
        _sql_main_content(),
    )
    assert ok, detail


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_page_metadata_oracle(spark, sf_dir):
    ok, detail = compare(
        spark, sf_dir, q_page_metadata(spark, sf_dir),
        _sql_page_metadata(),
    )
    assert ok, detail
