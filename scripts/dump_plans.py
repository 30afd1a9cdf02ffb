#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries into
``plans/r12/<query>_<tag>.txt`` (the optimization round's before/after
plan evidence).

Usage:
    python scripts/dump_plans.py --tag before host_hits textclf_train ...
    python scripts/dump_plans.py --tag after --all-touched

Plans are built, not executed, so the sweep is seconds. The session
uses the same pinned confs as scripts/plan_fingerprints.py so the
captured shapes match the fingerprint ledger.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from vectra_py_spark.plans.entry_queries import QUERIES  # noqa: E402
from vectra_py_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
OUT = REPO / "plans" / "r12"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+", help="queries() registry names")
    ap.add_argument("--tag", required=True, choices=["before", "after"])
    ap.add_argument("--sf", default=SF)
    args = ap.parse_args()

    unknown = [n for n in args.names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        df = QUERIES[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = OUT / f"{name}_{args.tag}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
