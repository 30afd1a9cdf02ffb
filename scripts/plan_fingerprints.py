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


def main() -> None:
    spark = get_spark("plan-fingerprints")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for name, fn in sorted(ALL_QUERIES.items()):
        try:
            plan = (
                fn(spark, SF)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            out[name] = fingerprint(plan)
        except Exception as ex:  # pragma: no cover - diagnostic path
            out[name] = {"error": str(ex)[:200]}
    (REPO / "PLANS.json").write_text(json.dumps(out, indent=1, sort_keys=True))
    n_err = sum(1 for v in out.values() if "error" in v)
    print(json.dumps({"queries": len(out), "errors": n_err}))
    spark.stop()


if __name__ == "__main__":
    main()
