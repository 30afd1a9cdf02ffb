#!/usr/bin/env python
"""Per-query isolation re-time: the one-command answer to "is this
BENCH mover a plan regression or driver-box load?" (VERDICT r8 item 5
— the method BENCH.md's round-8 analysis applied by hand).

    python scripts/bench_isolate.py lsh_neardup_strict [more names...]
    python scripts/bench_isolate.py --runs 5 dml_insert

Each named query runs in THIS fresh process (cold JVM, nothing else
on the session) at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``: one untimed
warm-up execution (JIT + codegen + page cache, matching bench.py's
warm-up discipline), then ``--runs`` timed executions. Prints one
JSON line per query with min/median/max plus the box load average at
each measurement, so a mover can be compared against the committed
BENCH_LATEST.json value with load visible. A re-time at or below the
committed value under low load ⇒ environmental; consistently above
under low load ⇒ a real regression worth bisecting.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from vectra_py_spark.plans.entry_queries import QUERIES  # noqa: E402
from vectra_py_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+", help="queries() registry names")
    ap.add_argument("--runs", type=int, default=3,
                    help="timed executions per query (default 3)")
    args = ap.parse_args()

    unknown = [n for n in args.names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; see "
                 "vectra_py_spark/plans/entry_queries.py::QUERIES")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("vectra-py-spark-bench-isolate")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.names:
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()  # warm-up, untimed
        walls = []
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            walls.append(time.perf_counter() - t0)
        walls.sort()
        try:
            load_avg = [round(x, 2) for x in os.getloadavg()]
        except OSError:
            load_avg = None
        print(json.dumps({
            "query": name,
            "sf_dir": sf_dir,
            "runs": len(walls),
            "min_s": round(walls[0], 4),
            "median_s": round(walls[len(walls) // 2], 4),
            "max_s": round(walls[-1], 4),
            "load_avg": load_avg,
        }))

    spark.stop()


if __name__ == "__main__":
    main()
