#!/usr/bin/env python
"""10x-scale stress of the relational (TPC-H-shape) query family.

Generates a 10x sf0.1 star schema (150k customer / 1.5M orders / 6M
lineitem / 200k part; region+nation copied from the fixture) with
Spark-side seeded column distributions mirroring the fixture's shapes,
then times each relational query at sf0.1 and at 10x in one session.
`vs_10x` = wall / (10 x sf0.1 wall); <= ~1 means the plan scales at
worst linearly with the fact tables (broadcast joins + partial aggs —
the claim BENCH.md makes — predict well under 1 because the fixed
per-plan overhead amortizes).

Usage: python scripts/stress_relational.py   (writes /tmp/vectra_stress_rel)
Output: one JSON line; numbers go into BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from vectra_py_spark.plans.entry_queries import QUERIES  # noqa: E402
from vectra_py_spark.session import get_spark  # noqa: E402

SF01_DIR = "/root/testdata/sf0.1"
BIG_DIR = "/tmp/vectra_stress_rel"
SCALE = 10
N_CUST = 15_000 * SCALE
N_ORDERS = 150_000 * SCALE
N_LINES = 600_000 * SCALE
N_PART = 20_000 * SCALE
N_SUPP = 1_000 * SCALE

STRESS_QUERIES = [
    "pricing_summary",
    "revenue_by_region",
    "shipping_priority",
    "promo_revenue",
    "late_ship_priority",
    "big_spenders",
    "rollup_revenue",
    "churned_rich",
    "nation_volume",
    "market_share",
    "returned_customers",
    "disjunctive_revenue",
    "waiting_suppliers",
    # plans/relational.py shapes (Q2/Q5/Q6/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q20)
    "min_cost_supplier",
    "local_supplier_volume",
    "forecast_revenue",
    "product_profit",
    "important_stock",
    "shipmode_priority",
    "customer_distribution",
    "top_supplier",
    "supplier_part_counts",
    "small_qty_revenue",
    "excess_suppliers",
]

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD"]
# fixture-style "adjective noun" part names (so the %widget% / 'red %'
# name-filtered shapes match a realistic fraction at 10x, like sf0.1)
P_ADJ = ["red", "blue", "hot", "cold", "old", "large", "small", "new"]
P_NOUN = ["widget", "ring", "bolt", "plate", "gear", "cog"]
EPOCH_95 = "1995-01-01"
SPAN_DAYS = 2400  # ~1995-2001, like the fixture


def _pick(col, values):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (col % len(values)).cast("int") + 1)


def generate(spark) -> None:
    # deterministic hash-derived columns: rerunnable, no RNG state
    def h(col, salt):
        return F.abs(F.xxhash64(col.cast("string"), F.lit(salt)))

    for name in ("region", "nation"):
        spark.read.parquet(f"{SF01_DIR}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{BIG_DIR}/{name}.parquet")

    n_nations = spark.read.parquet(f"{SF01_DIR}/nation.parquet").count()

    cust = spark.range(N_CUST).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        (h(F.col("id"), 1) % n_nations).cast("int").alias("c_nationkey"),
        ((h(F.col("id"), 2) % 1_100_000) / 100.0 - 1000.0).alias("c_acctbal"),
        _pick(h(F.col("id"), 3), SEGMENTS).alias("c_mktsegment"),
    )
    cust.repartition(32).write.mode("overwrite").parquet(
        f"{BIG_DIR}/customer.parquet"
    )

    base = F.lit(EPOCH_95).cast("timestamp_ntz")
    orders = spark.range(N_ORDERS).select(
        F.col("id").alias("o_orderkey"),
        (h(F.col("id"), 4) % N_CUST).alias("o_custkey"),
        _pick(h(F.col("id"), 5), ["O", "F", "P"]).alias("o_orderstatus"),
        ((h(F.col("id"), 6) % 50_000_000) / 100.0).alias("o_totalprice"),
        (base + F.make_interval(
            days=(h(F.col("id"), 7) % SPAN_DAYS).cast("int"))
         ).alias("o_orderdate"),
        _pick(h(F.col("id"), 8), PRIORITIES).alias("o_orderpriority"),
    )
    orders.repartition(32).write.mode("overwrite").parquet(
        f"{BIG_DIR}/orders.parquet"
    )

    li = spark.range(N_LINES).select(
        (h(F.col("id"), 9) % N_ORDERS).alias("l_orderkey"),
        (h(F.col("id"), 10) % N_PART).alias("l_partkey"),
        (h(F.col("id"), 11) % N_SUPP).alias("l_suppkey"),
        (F.col("id") % 7).cast("int").alias("l_linenumber"),
        ((h(F.col("id"), 12) % 50) + 1).cast("double").alias("l_quantity"),
        ((h(F.col("id"), 13) % 10_000_000) / 100.0).alias("l_extendedprice"),
        ((h(F.col("id"), 14) % 11) / 100.0).alias("l_discount"),
        ((h(F.col("id"), 15) % 9) / 100.0).alias("l_tax"),
        _pick(h(F.col("id"), 16), ["A", "N", "R"]).alias("l_returnflag"),
        _pick(h(F.col("id"), 17), ["O", "F"]).alias("l_linestatus"),
        (base + F.make_interval(
            days=(h(F.col("id"), 18) % (SPAN_DAYS + 120)).cast("int"))
         ).alias("l_shipdate"),
    )
    li.repartition(32).write.mode("overwrite").parquet(
        f"{BIG_DIR}/lineitem.parquet"
    )

    part = spark.range(N_PART).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            _pick(h(F.col("id"), 25), P_ADJ),
            F.lit(" "),
            _pick(h(F.col("id"), 26), P_NOUN),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), (h(F.col("id"), 19) % 50)).alias("p_brand"),
        _pick(h(F.col("id"), 20), PTYPES).alias("p_type"),
        (h(F.col("id"), 21) % 50 + 1).cast("int").alias("p_size"),
        ((h(F.col("id"), 22) % 200_000) / 100.0).alias("p_retailprice"),
    )
    part.repartition(8).write.mode("overwrite").parquet(
        f"{BIG_DIR}/part.parquet"
    )

    supp = spark.range(N_SUPP).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        (h(F.col("id"), 23) % n_nations).cast("int").alias("s_nationkey"),
        ((h(F.col("id"), 24) % 1_100_000) / 100.0 - 1000.0).alias("s_acctbal"),
    )
    supp.repartition(4).write.mode("overwrite").parquet(
        f"{BIG_DIR}/supplier.parquet"
    )


def main() -> None:
    spark = get_spark("vectra-stress-relational")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)

    report: dict = {
        "scale": SCALE, "n_orders": N_ORDERS, "n_lineitem": N_LINES,
        "queries": {},
    }
    for name in STRESS_QUERIES:
        fn = QUERIES[name]
        fn(spark, SF01_DIR).count()  # warm both plan shapes
        t0 = time.perf_counter()
        small_rows = fn(spark, SF01_DIR).count()
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        big_rows = fn(spark, BIG_DIR).count()
        t_big = time.perf_counter() - t0
        report["queries"][name] = {
            "sf0.1_sec": round(t_small, 2),
            "10x_sec": round(t_big, 2),
            "sf0.1_rows": small_rows,
            "10x_rows": big_rows,
            "vs_10x": round(t_big / (10.0 * t_small), 2) if t_small else None,
        }
        print(f"# {name}: {report['queries'][name]}", file=sys.stderr)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
