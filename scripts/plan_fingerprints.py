#!/usr/bin/env python
"""Dump a physical-plan fingerprint for EVERY registered driver query:
exchange count (hash/range/round-robin), broadcast count, whether a
TakeOrderedAndProject serves the top-k, and whether any Parquet scan
carries pushed filters. Written to PLANS.json; the paired test
(tests/test_plan_fingerprints.py) fails any future change that ADDS
exchanges to a query — the mechanical backstop behind the hand-written
plan-shape pins.

Plans are analyzed, not executed (streaming-free queries only build a
physical plan), so the whole sweep is seconds.

Usage: python scripts/plan_fingerprints.py   (rewrites PLANS.json)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from vectra_py_spark.plans.entry_queries import (  # noqa: E402
    QUERIES,
    RETIRED_QUERIES,
)
from vectra_py_spark.session import get_spark  # noqa: E402

# Retired entries (VERDICT r10 item 2) keep their plan-regression
# backstop even though they left the driver window.
ALL_QUERIES = {**QUERIES, **RETIRED_QUERIES}

SF = "/root/testdata/sf0.001"


def fingerprint(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Round)", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "top_k": "TakeOrderedAndProject" in plan,
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[[^\]]+\]", plan)
        ),
    }


class capture_ckpt_subplans:
    """Record the executed-plan string of every DataFrame that gets
    ``localCheckpoint``ed while a query function runs (ADVICE r12:
    checkpoint-truncated FINAL plans hide the pre-checkpoint scans, so
    a fingerprint of the final plan alone cannot detect a lost
    PushedFilters / grown exchange in the truncated part of the
    pipeline). Thread-safe (list.append under the GIL) because
    ``_checkpoint_all`` checkpoints from a thread pool."""

    def __init__(self):
        self.plans: list[str] = []

    @staticmethod
    def _df_class():
        # Spark 4 splits DataFrame into an abstract base + a classic
        # implementation that OVERRIDES localCheckpoint — patch the
        # class whose method actually runs
        try:
            from pyspark.sql.classic.dataframe import DataFrame
        except ImportError:  # Spark 3.x
            from pyspark.sql import DataFrame
        return DataFrame

    def __enter__(self):
        cls = self._df_class()
        self._orig = cls.localCheckpoint
        cap = self.plans
        orig = self._orig

        def spy(df, eager=True):
            try:
                cap.append(
                    df._jdf.queryExecution().executedPlan().toString()
                )
            except Exception:
                pass
            return orig(df, eager)

        cls.localCheckpoint = spy
        return self

    def __exit__(self, *exc):
        self._df_class().localCheckpoint = self._orig
        return False


def fingerprint_query(fn, spark) -> dict:
    """Final-plan fingerprint + aggregated pre-checkpoint sub-plan
    fingerprint for one query function."""
    with capture_ckpt_subplans() as cap:
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    fp = fingerprint(plan)
    subs = [fingerprint(p) for p in cap.plans]
    fp["ckpt_subplans"] = len(subs)
    fp["ckpt_exchanges"] = sum(s["exchanges"] for s in subs)
    fp["ckpt_pushed_filters"] = any(s["pushed_filters"] for s in subs)
    return fp


def main() -> None:
    spark = get_spark("plan-fingerprints")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for name, fn in sorted(ALL_QUERIES.items()):
        try:
            out[name] = fingerprint_query(fn, spark)
        except Exception as ex:  # pragma: no cover - diagnostic path
            out[name] = {"error": str(ex)[:200]}
    (REPO / "PLANS.json").write_text(json.dumps(out, indent=1, sort_keys=True))
    n_err = sum(1 for v in out.values() if "error" in v)
    print(json.dumps({"queries": len(out), "errors": n_err}))
    spark.stop()


if __name__ == "__main__":
    main()
