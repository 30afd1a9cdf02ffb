#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries into
``plans/r<N>/<query>_<tag>.txt`` (the optimization round's
before/after plan evidence).

Usage:
    python scripts/dump_plans.py --tag before host_hits textclf_train ...
    python scripts/dump_plans.py --tag after --round r13 bitext_mine

r13+: queries whose construction ``localCheckpoint``s intermediate
frames have checkpoint-TRUNCATED final plans (the pre-checkpoint
pipeline is invisible there — ADVICE r12); the dump therefore appends
every captured pre-checkpoint sub-plan after the final plan, so the
committed evidence shows the whole pipeline.

Plans are built, not executed (except the eager checkpoints a query's
construction runs itself). The session uses the same pinned confs as
scripts/plan_fingerprints.py so the captured shapes match the
fingerprint ledger.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from scripts.plan_fingerprints import capture_ckpt_subplans  # noqa: E402

from vectra_py_spark.plans.entry_queries import QUERIES  # noqa: E402
from vectra_py_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+", help="queries() registry names")
    ap.add_argument("--tag", required=True, choices=["before", "after"])
    ap.add_argument("--round", default="r13", dest="round_tag")
    ap.add_argument("--sf", default=SF)
    args = ap.parse_args()

    unknown = [n for n in args.names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    out = REPO / "plans" / args.round_tag
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        with capture_ckpt_subplans() as cap:
            df = QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        parts = [plan]
        for i, sub in enumerate(cap.plans):
            parts.append(
                f"\n\n=== pre-checkpoint sub-plan {i + 1}/"
                f"{len(cap.plans)} (captured at localCheckpoint; "
                "executedPlan string) ===\n" + sub
            )
        path = out / f"{name}_{args.tag}.txt"
        text = "".join(parts)
        path.write_text(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
