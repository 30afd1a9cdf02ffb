"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`vectra_py_spark.plans.entry_queries`;
this file stays a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from vectra_py_spark.plans import entry_queries as _eq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: metadata-filtered cosine
    top-k over the embeddings table (SURVEY.md §3.1 — the reference's
    core ``query_items`` lifecycle, Spark-first)."""
    return _eq.q_vector_topk_filtered(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_eq.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-able query."""
    return dict(_eq.ORACLES)
