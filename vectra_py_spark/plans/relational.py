"""Relational query shapes completing the TPC-H-style sweep (Q2, Q5, Q6,
Q9, Q11, Q12, Q13, Q15, Q16, Q17, Q20 adapted to the fixture star
schema; the remaining shapes live in plans/entry_queries.py — all 22
TPC-H query shapes are covered between the two modules).

The reference engine has no relational algebra at all (SURVEY.md §1.1 —
its only "query" is filter → cosine top-k, ``local_index.py:125-150``);
these queries are part of the north-star surface: the relational
workload a training-data pipeline runs next to the vector/dedup
operators, expressed Spark-first and oracle-checked against DuckDB.

Adaptations from classic TPC-H (fixture schema has no partsupp table,
no l_commitdate/l_receiptdate/l_shipmode, no p_mfgr/p_container):
- supplier↔part relationships derive from the lineitem fact
  (``SELECT DISTINCT l_partkey, l_suppkey``) instead of partsupp;
- supply cost proxies use ``s_acctbal`` (Q2) / ``p_retailprice`` (Q9);
- Q12's shipmode becomes a ship-delay bucket from
  ``datediff(l_shipdate, o_orderdate)``.

Determinism rules match plans/entry_queries.py: money math in DECIMAL
(exact, order-independent), cast to DOUBLE and rounded on output;
threshold comparisons restructured to integer/decimal-exact forms (see
``q_small_qty_revenue``: ``2*qty*cnt < sum`` instead of
``qty < 0.2*avg`` so no float divide sits on a filter boundary).

100 TB design notes are on each query; the shared shapes:
- dimension filters broadcast into the fact scan (no fact shuffle
  before aggregation) and push down to parquet;
- agg-then-join-back (argmin/argmax, HAVING-vs-total) broadcasts the
  tiny aggregate, never re-shuffling the fact;
- distinct pair extraction (Q16/Q2) shuffles ids only, never payloads.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["RELATIONAL_QUERIES", "RELATIONAL_ORACLES"]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col: str):
    return F.col(col).cast("decimal(18,2)")


def _one():
    # built lazily: Column construction needs an active SparkContext
    return F.lit(1).cast("decimal(18,2)")


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Q2 shape — argmin join-back (min-cost supplier per part)
# ---------------------------------------------------------------------------
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin over eligible suppliers.

    100 TB design: the (part, supplier) pair set is distinct-ed with ids
    only (one shuffle, no payloads); part/supplier/nation dims broadcast;
    the argmin is a window min over the partkey partition — the same
    single shuffle the distinct already established, no re-agg + join
    back needed.
    """
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    sup = _load(spark, sf_dir, "supplier")
    nation = _load(spark, sf_dir, "nation")
    region = _load(spark, sf_dir, "region")

    pairs = li.select("l_partkey", "l_suppkey").distinct()
    parts = part.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name")
    eligible = (
        sup.join(
            F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        pairs.join(F.broadcast(parts), pairs.l_partkey == parts.p_partkey)
        .join(F.broadcast(eligible), pairs.l_suppkey == eligible.s_suppkey)
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            "n_name",
        )
    )


def _sql_min_cost_supplier() -> str:
    return """
        WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        eligible AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE')
        SELECT p_partkey, p_name, s_name,
               ROUND(s_acctbal, 2) AS acctbal, n_name
        FROM pairs
        JOIN part ON p_partkey = l_partkey
        JOIN eligible ON s_suppkey = l_suppkey
        WHERE p_type = 'STANDARD' AND p_size <= 15
        QUALIFY s_acctbal = MIN(s_acctbal) OVER (PARTITION BY p_partkey)
    """


# ---------------------------------------------------------------------------
# Q6 shape — single filtered aggregate (forecast revenue change)
# ---------------------------------------------------------------------------
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-agg, zero joins.

    100 TB design: all three predicates push to the parquet scan
    (min/max row-group pruning on l_shipdate); the sum is map-side
    partial — one 1-row exchange. This is the cheapest possible shape
    per byte scanned; DECIMAL keeps the sum order-independent.
    """
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("forecast_revenue")
        )
    )


def _sql_forecast_revenue() -> str:
    return """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS forecast_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.04 AND 0.06
          AND l_quantity < 24
    """


# ---------------------------------------------------------------------------
# Q9 shape — multi-dim profit rollup (product profit by nation/year)
# ---------------------------------------------------------------------------
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-table join, profit = revenue − cost, grouped by
    (nation, year). Cost proxies p_retailprice (fixture has no
    ps_supplycost).

    100 TB design: part (name-filtered), supplier, nation all broadcast
    into the lineitem scan; orders joins on the orderkey (the one big
    join — AQE picks shuffle vs broadcast by actual size); both sums
    are partial-agg'd map-side before the final (nation, year) exchange.
    Revenue and cost stay separate DECIMAL sums; the subtraction happens
    once per output row in DOUBLE (exact inputs, one rounding).
    """
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    sup = _load(spark, sf_dir, "supplier")
    nation = _load(spark, sf_dir, "nation")
    orders = _load(spark, sf_dir, "orders")

    widgets = part.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    sn = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(widgets), li.l_partkey == widgets.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
            .cast("double")
            .alias("rev"),
            F.sum(_dec("p_retailprice") * _dec("l_quantity"))
            .cast("double")
            .alias("cost"),
        )
        .select(
            "n_name",
            "o_year",
            F.round(F.col("rev") - 0.5 * F.col("cost"), 2).alias("profit"),
        )
    )


def _sql_product_profit() -> str:
    return """
        SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS o_year,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                              (CAST(1 AS DECIMAL(18,2)) -
                               CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                     - 0.5 * CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) *
                                      CAST(l_quantity AS DECIMAL(18,2)))
                                  AS DOUBLE), 2) AS profit
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, YEAR(o_orderdate)
    """


# ---------------------------------------------------------------------------
# Q11 shape — HAVING vs a scalar total (important stock value)
# ---------------------------------------------------------------------------
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value from two nations' suppliers,
    keeping parts above a fraction of the grand total.

    100 TB design: the nation-filtered supplier key set broadcasts as a
    semi-join into the fact scan; per-part values partial-agg before one
    exchange; the grand total re-aggregates the per-part result (tiny)
    and broadcasts back as a 1-row nested-loop build side — the fact is
    scanned exactly once.
    """
    li = _load(spark, sf_dir, "lineitem")
    sup = _load(spark, sf_dir, "supplier")
    nation = _load(spark, sf_dir, "nation")

    nsup = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select("s_suppkey")
    )
    vals = (
        li.join(F.broadcast(nsup), li.l_suppkey == nsup.s_suppkey, "leftsemi")
        .groupBy("l_partkey")
        .agg(
            F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias(
                "v"
            )
        )
    )
    total = vals.agg(F.sum("v").alias("t"))
    return (
        vals.join(F.broadcast(total))
        .filter(F.col("v") > F.col("t") * F.lit(0.001))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
    )


def _sql_important_stock() -> str:
    return """
        WITH nsup AS (
          SELECT s_suppkey FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name IN ('NATION_3', 'NATION_7')),
        vals AS (
          SELECT l_partkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (CAST(1 AS DECIMAL(18,2)) -
                      CAST(l_discount AS DECIMAL(18,2)))) AS v
          FROM lineitem
          WHERE l_suppkey IN (SELECT s_suppkey FROM nsup)
          GROUP BY l_partkey)
        SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
        FROM vals
        WHERE v > (SELECT SUM(v) * 0.001 FROM vals)
    """


# ---------------------------------------------------------------------------
# Q12 shape — conditional two-way counts by ship-delay bucket
# ---------------------------------------------------------------------------
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: ship-delay buckets (fixture has no l_shipmode)
    × priority-class conditional counts.

    100 TB design: the date window pushes to the lineitem scan; the
    orderkey join is the only exchange (AQE-sized); the CASE counts are
    map-side partial into a 3-row result.
    """
    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay >= 60, "SLOW").when(delay >= 30, "MEDIUM").otherwise("FAST")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def _sql_shipmode_priority() -> str:
    return """
        SELECT CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) >= 60
                    THEN 'SLOW'
                    WHEN DATE_DIFF('day', o_orderdate, l_shipdate) >= 30
                    THEN 'MEDIUM' ELSE 'FAST' END AS ship_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Q13 shape — outer-join count distribution (customer order counts)
# ---------------------------------------------------------------------------
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an ON-clause filter, count
    per customer, then the distribution of those counts.

    100 TB design: two inherent exchanges (custkey join+agg, then the
    tiny c_count re-agg). The join-side filter (status <> 'P') sits in
    the join ON clause, NOT a WHERE — zero-order customers must survive
    with count 0. COUNT(o_orderkey) (null-skipping) encodes that.
    """
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    filtered = orders.filter(F.col("o_orderstatus") != "P").select(
        "o_custkey", "o_orderkey"
    )
    return (
        cust.join(filtered, cust.c_custkey == filtered.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def _sql_customer_distribution() -> str:
    return """
        WITH co AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderstatus <> 'P'
          GROUP BY c_custkey)
        SELECT c_count, COUNT(*) AS custdist
        FROM co GROUP BY c_count
    """


# ---------------------------------------------------------------------------
# Q15 shape — argmax vs a scalar subquery (top supplier by revenue)
# ---------------------------------------------------------------------------
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier; keep the
    max-revenue supplier(s) via an exact DECIMAL equality against the
    re-aggregated max.

    100 TB design: revenue partial-aggs map-side into one suppkey
    exchange; the max is a global window over the per-supplier aggregate
    (≤ |suppliers| rows — a deliberate single-partition pass over a tiny
    set, NOT the fact), so the fact is scanned exactly once with no
    self-join; supplier dim broadcasts for the name join. DECIMAL makes
    the max-equality exact — never compare float aggregates.
    """
    li = _load(spark, sf_dir, "lineitem")
    sup = _load(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1998-01-01"))
            & (F.col("l_shipdate") < _ts("1998-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias(
                "r"
            )
        )
    )
    w = Window.partitionBy()
    return (
        rev.withColumn("mr", F.max("r").over(w))
        .filter(F.col("r") == F.col("mr"))
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("r").cast("double").alias("total_revenue"),
        )
    )


def _sql_top_supplier() -> str:
    return """
        WITH rev AS (
          SELECT l_suppkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (CAST(1 AS DECIMAL(18,2)) -
                      CAST(l_discount AS DECIMAL(18,2)))) AS r
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1998-01-01'
            AND l_shipdate <  TIMESTAMP '1998-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON s_suppkey = l_suppkey
        WHERE r = (SELECT MAX(r) FROM rev)
    """


# ---------------------------------------------------------------------------
# Q16 shape — distinct-count with NOT-IN exclusion (supplier part counts)
# ---------------------------------------------------------------------------
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) slice,
    excluding a supplier blacklist (NOT IN → anti-join).

    100 TB design: the (part, supplier) pair distinct shuffles ids only;
    the blacklist (negative-balance suppliers) broadcasts as an
    anti-join; part dim broadcasts. COUNT(DISTINCT) over the already
    distinct pair set costs nothing extra — the expand/re-agg collapses.
    """
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    sup = _load(spark, sf_dir, "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(
        (F.col("p_brand") != "Brand#21")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "anti")
        .join(F.broadcast(parts), pairs.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def _sql_supplier_part_counts() -> str:
    return """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """


# ---------------------------------------------------------------------------
# Q17 shape — correlated average threshold (small-quantity revenue)
# ---------------------------------------------------------------------------
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity, for one brand/type slice.

    The threshold is restructured to be arithmetic-exact:
    ``qty < 0.2 * avg(qty)`` ⇔ ``2 * qty * cnt < sum(qty)`` over
    DECIMAL/ints — no float division on the filter boundary, so the
    row set is bit-identical across engines.

    100 TB design: the brand/type part keys broadcast; per-part
    (sum, cnt) partial-aggs into one small exchange and broadcasts back
    against the second fact pass — at scale Catalyst reuses the
    shuffled scan (ReusedExchange), or restructure via a window over
    one partkey exchange if the double scan ever dominates.
    """
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    pkeys = part.filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    sliced = li.join(F.broadcast(pkeys), li.l_partkey == pkeys.p_partkey)
    pstats = sliced.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("sq"), F.count("*").alias("cnt")
    )
    pstats = pstats.select(
        F.col("l_partkey").alias("pk"), "sq", "cnt"
    )
    return (
        sliced.join(F.broadcast(pstats), sliced.l_partkey == pstats.pk)
        .filter(F.lit(2) * _dec("l_quantity") * F.col("cnt") < F.col("sq"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


def _sql_small_qty_revenue() -> str:
    return """
        WITH pstats AS (
          SELECT l_partkey AS pk,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                 COUNT(*) AS cnt
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
          GROUP BY l_partkey)
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                          AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN pstats ON l_partkey = pk
        WHERE 2 * CAST(l_quantity AS DECIMAL(18,2)) * cnt < sq
    """


# ---------------------------------------------------------------------------
# Q20 shape — nested semi-join chain (suppliers with excess shipments)
# ---------------------------------------------------------------------------
def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped > 60 units of any
    red-prefixed part during 1997 — a nested IN chain flattened into
    semi-joins.

    100 TB design: part keys (name-filtered) broadcast-semi into the
    date-pruned fact scan; the (supp, part) agg partial-aggs map-side;
    the surviving supplier ids (tiny) broadcast-semi against the
    supplier dim; nation broadcasts. No fact shuffle on a join key.
    """
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    sup = _load(spark, sf_dir, "supplier")
    nation = _load(spark, sf_dir, "nation")
    red = part.filter(F.col("p_name").like("red %")).select("p_partkey")
    excess = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(F.broadcast(red), li.l_partkey == red.p_partkey, "leftsemi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 60)
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(F.broadcast(excess), sup.s_suppkey == excess.l_suppkey, "leftsemi")
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
    )


def _sql_excess_suppliers() -> str:
    return """
        WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
        shipped AS (
          SELECT l_suppkey, l_partkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
            AND l_partkey IN (SELECT p_partkey FROM red)
          GROUP BY l_suppkey, l_partkey)
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN
              (SELECT DISTINCT l_suppkey FROM shipped WHERE q > 60)
    """


# ---------------------------------------------------------------------------
# Q5 shape — region-local supplier revenue (customer nation == supplier nation)
# ---------------------------------------------------------------------------
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation within one region, counting
    only lineitems where the ordering customer and the supplier share a
    nation ("local" volume). Completes the 22-shape TPC-H sweep.

    100 TB design: nation⋈region collapses to a ≤25-row nation set that
    broadcasts into BOTH dims; the region-filtered supplier dim
    broadcasts into the date-pruned fact scan (o_orderdate predicate
    pushes through the orders join); orders⋈customer and fact⋈orders
    are the two big joins — AQE sizes them, and the locality predicate
    (c_nationkey = s_nationkey) is applied as a join residual, never a
    separate shuffle. The final groupBy carries ≤ nations rows.
    """
    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    sup = _load(spark, sf_dir, "supplier")
    nation = _load(spark, sf_dir, "nation")
    region = _load(spark, sf_dir, "region")

    rnations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    rsup = sup.join(
        F.broadcast(rnations), sup.s_nationkey == rnations.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    co = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1999-01-01"))
    ).join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        li.join(F.broadcast(rsup), li.l_suppkey == rsup.s_suppkey)
        .join(co, li.l_orderkey == co.o_orderkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
                .cast("double"),
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


def _sql_local_supplier_volume() -> str:
    return """
        SELECT n_name,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                              (CAST(1 AS DECIMAL(18,2)) -
                               CAST(l_discount AS DECIMAL(18,2))))
                          AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC
    """


RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "local_supplier_volume": q_local_supplier_volume,
    "min_cost_supplier": q_min_cost_supplier,
    "forecast_revenue": q_forecast_revenue,
    "product_profit": q_product_profit,
    "important_stock": q_important_stock,
    "shipmode_priority": q_shipmode_priority,
    "customer_distribution": q_customer_distribution,
    "top_supplier": q_top_supplier,
    "supplier_part_counts": q_supplier_part_counts,
    "small_qty_revenue": q_small_qty_revenue,
    "excess_suppliers": q_excess_suppliers,
}

RELATIONAL_ORACLES: dict[str, str] = {
    "local_supplier_volume": _sql_local_supplier_volume(),
    "min_cost_supplier": _sql_min_cost_supplier(),
    "forecast_revenue": _sql_forecast_revenue(),
    "product_profit": _sql_product_profit(),
    "important_stock": _sql_important_stock(),
    "shipmode_priority": _sql_shipmode_priority(),
    "customer_distribution": _sql_customer_distribution(),
    "top_supplier": _sql_top_supplier(),
    "supplier_part_counts": _sql_supplier_part_counts(),
    "small_qty_revenue": _sql_small_qty_revenue(),
    "excess_suppliers": _sql_excess_suppliers(),
}
