"""Mechanical plan-regression backstop: every registered query's
physical plan must not grow NEW exchanges (shuffles) or lose its
TakeOrderedAndProject / pushed filters relative to the committed
PLANS.json fingerprints (regenerate deliberately with
scripts/plan_fingerprints.py when a plan change is intentional)."""

from __future__ import annotations

import json
from pathlib import Path

from scripts.plan_fingerprints import SF, fingerprint

from vectra_py_spark.plans.entry_queries import QUERIES

BASELINE = json.loads(
    (Path(__file__).resolve().parents[1] / "PLANS.json").read_text()
)


def test_no_query_grew_exchanges(spark):
    regressions = []
    for name, fn in sorted(QUERIES.items()):
        base = BASELINE.get(name)
        if not base or "error" in base:
            continue
        got = fingerprint(
            fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        if got["exchanges"] > base["exchanges"]:
            regressions.append((name, base["exchanges"], got["exchanges"]))
        if base["top_k"] and not got["top_k"]:
            regressions.append((name, "lost TakeOrderedAndProject", ""))
        if base["pushed_filters"] and not got["pushed_filters"]:
            regressions.append((name, "lost PushedFilters", ""))
    assert not regressions, regressions


def test_baseline_covers_registry():
    missing = set(QUERIES) - set(BASELINE)
    assert not missing, f"regenerate PLANS.json: {missing}"
