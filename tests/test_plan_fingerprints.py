"""Mechanical plan-regression backstop: every registered query's
physical plan must not grow NEW exchanges (shuffles) or lose its
TakeOrderedAndProject / pushed filters relative to the committed
PLANS.json fingerprints (regenerate deliberately with
scripts/plan_fingerprints.py when a plan change is intentional)."""

from __future__ import annotations

import json
from pathlib import Path

from scripts.plan_fingerprints import SF, fingerprint_query

from vectra_py_spark.plans.entry_queries import QUERIES, RETIRED_QUERIES

# retired entries keep their mechanical plan backstop (VERDICT r10 item 2)
ALL_QUERIES = {**QUERIES, **RETIRED_QUERIES}

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier

BASELINE = json.loads(
    (Path(__file__).resolve().parents[1] / "PLANS.json").read_text()
)


# plan shapes depend on these confs; other tests may tweak them (and
# restore imperfectly), so pin the generation-time values for the sweep
_PINNED = {
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "vectra_py_spark.similarity.broadcastBytes": str(256 * 1024 * 1024),
}


def test_no_query_grew_exchanges(spark):
    # Earlier tests may leave cached relations behind; a cached input
    # substitutes InMemoryRelation into the plan and changes the
    # exchange count, making the sweep order-dependent. Drop them.
    spark.catalog.clearCache()
    saved = {}
    for k, v in _PINNED.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    regressions = []
    try:
        for name, fn in sorted(ALL_QUERIES.items()):
            base = BASELINE.get(name)
            if not base or "error" in base:
                continue
            got = fingerprint_query(fn, spark)
            if got["exchanges"] > base["exchanges"]:
                regressions.append(
                    (name, base["exchanges"], got["exchanges"])
                )
            # pre-checkpoint sub-plans (ADVICE r12): checkpoint-
            # truncated final plans hide the truncated pipeline, so
            # exchange growth and pushdown loss are ALSO checked over
            # the captured localCheckpoint sub-plans
            if got.get("ckpt_exchanges", 0) > base.get(
                "ckpt_exchanges", 0
            ):
                regressions.append(
                    (
                        name,
                        "ckpt sub-plan exchanges grew",
                        (base.get("ckpt_exchanges"),
                         got.get("ckpt_exchanges")),
                    )
                )
            if base["top_k"] and not got["top_k"]:
                regressions.append((name, "lost TakeOrderedAndProject", ""))
            base_pushed = base["pushed_filters"] or base.get(
                "ckpt_pushed_filters", False
            )
            got_pushed = got["pushed_filters"] or got.get(
                "ckpt_pushed_filters", False
            )
            if base_pushed and not got_pushed:
                regressions.append((name, "lost PushedFilters", ""))
    finally:
        # always restore — a raised query must not leak pinned confs
        # into later tests sharing the session
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert not regressions, regressions


def test_baseline_covers_registry():
    missing = set(ALL_QUERIES) - set(BASELINE)
    assert not missing, f"regenerate PLANS.json: {missing}"
