"""Sketch aggregations bounded against exact results on the events
fixture (`vectra_py_spark.operators.sketches`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from vectra_py_spark.operators.sketches import approx_distinct, approx_quantiles
from vectra_py_spark.plans.entry_queries import load


def test_approx_distinct_within_rsd_bounds(spark):
    ev = load(spark, SF_ORACLE, "events")
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct(ev, ["event_type"], "user_id", rsd=0.02).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        # 5 standard errors at rsd=0.02
        assert abs(approx[k] - exact[k]) <= max(2, 0.1 * exact[k]), (
            k, approx[k], exact[k],
        )


def test_approx_quantiles_within_rank_error(spark):
    ev = load(spark, SF_ORACLE, "events")
    got = approx_quantiles(ev, ["event_type"], "value", probs=(0.5, 0.9)).collect()
    per_type_values = {
        r["event_type"]: sorted(v for v in r["vals"] if v is not None)
        for r in ev.groupBy("event_type")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    for r in got:
        vals = per_type_values[r["event_type"]]
        n = len(vals)
        for p, col in ((0.5, "q_0_5"), (0.9, "q_0_9")):
            # rank error ≤ n/accuracy (+1 slack for discreteness)
            target = int(p * n)
            tol = max(2, n // 10_000 + 1)
            lo = vals[max(0, target - tol)]
            hi = vals[min(n - 1, target + tol)]
            assert lo <= r[col] <= hi, (r["event_type"], p, r[col], lo, hi)


def test_sketch_merge_is_partitioning_invariant(spark):
    ev = load(spark, SF_ORACLE, "events")
    a = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct(ev, ["event_type"], "user_id").collect()
    }
    b = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct(
            ev.repartition(7, "user_id"), ["event_type"], "user_id"
        ).collect()
    }
    assert a == b


def test_cms_heavy_hitters_brackets_exact_counts(spark):
    from vectra_py_spark.operators.sketches import cms_heavy_hitters

    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
    ).filter(F.col("t") != "")
    n = toks.count()
    exact = {
        r.t: r.cnt
        for r in toks.groupBy("t").agg(F.count("*").alias("cnt")).collect()
    }
    est = cms_heavy_hitters(toks, "t", k=10, sample_frac=0.2)
    assert len(est) == 10
    for tok, c in est:
        # CMS never underestimates; overestimates by <= eps*N whp
        assert exact[tok] <= c <= exact[tok] + 1e-4 * n + 1
    # the estimated top-10 matches the exact top-10 token set on this
    # Zipfian fixture (heavy hitters are far above the error floor)
    exact_top = sorted(exact, key=lambda t: (-exact[t], t))[:10]
    assert {t for t, _ in est} == set(exact_top)
