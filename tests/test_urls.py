"""URL canonicalization (`functions/urls.py`): rule-by-rule unit
coverage plus the dedup aggregate — all pure Catalyst, no Python in
the plan."""

import pytest

from vectra_py_spark.functions.urls import canonical_url, url_dedup


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c for r in df.withColumn("c", canonical_url("url")).collect()
    ]


def test_rules(spark):
    got = _canon(spark, [
        "HTTP://WWW.Ex.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
        "https://Ex.com:443/path",
        "https://ex.com/p/",
        "http://ex.com/q?gclid=123&ref=tw",
        "https://www.ex.com/?a=2&a=1",
        "http://ex.com:8080/r#x",          # non-default port kept
        "https://ex.com",                   # no path at all
        "http://ex.com/?utm_campaign=z",    # all params stripped
        "not a url at all",                 # unparseable → NULL
    ])
    assert got == [
        "http://ex.com/a/b?a=1&b=2",
        "https://ex.com/path",
        "https://ex.com/p",
        "http://ex.com/q",
        "https://ex.com?a=1&a=2",
        "http://ex.com:8080/r",
        "https://ex.com",
        "http://ex.com",
        None,
    ]


def test_tracker_name_needs_boundary(spark):
    """'ref' strips as an exact name or 'ref=' prefix — but a param
    NAMED 'reference' (or 'refid=1') must survive; prefix-matching
    bare names would eat real parameters."""
    got = _canon(spark, [
        "http://ex.com/x?reference=keep&ref=drop",
        "http://ex.com/x?refid=1",
    ])
    assert got == [
        "http://ex.com/x?reference=keep",
        "http://ex.com/x?refid=1",
    ]


def test_url_dedup_survivor_and_counts(spark):
    rows = [
        ("http://ex.com/a?b=2&a=1",),
        ("HTTP://WWW.EX.COM:80/a/?a=1&b=2&utm_source=t",),
        ("http://ex.com/other",),
        ("garbage",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {
        r.canonical_url: (r.n_variants, r.keep_url)
        for r in url_dedup(df).collect()
    }
    assert got == {
        "http://ex.com/a?a=1&b=2": (
            2, "HTTP://WWW.EX.COM:80/a/?a=1&b=2&utm_source=t"
        ),
        "http://ex.com/other": (1, "http://ex.com/other"),
    }
    with pytest.raises(ValueError, match="keep must be"):
        url_dedup(df, keep="first")


def test_plan_is_codegen_projection(spark):
    """The normalizer must stay a whole-stage-codegen projection —
    no UDF, no exchange before the dedup aggregate."""
    df = spark.createDataFrame([("http://ex.com/a",)], "url string")
    plan = df.withColumn(
        "c", canonical_url("url")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan