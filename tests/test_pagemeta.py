"""Page-metadata extraction (`operators/pagemeta.py`): every field,
both attribute orders, entity unescape, absence → NULL, and the
codegen plan shape."""

from pyspark.sql import functions as F

from vectra_py_spark.operators.pagemeta import page_metadata_df

PAGE = """<html lang="en-GB"><head>
<title> Fish &amp; Chips — a guide </title>
<meta name="description" content="How to fry &quot;properly&quot;">
<meta content="OG Fish" property="og:title">
<meta property="og:description" content="og desc here">
<link href="https://ex.example/guide" rel="canonical">
<meta name="robots" content="NOINDEX, nofollow">
</head><body>b</body></html>"""


def test_full_page(spark):
    df = spark.createDataFrame(
        [("https://ex.example/guide?utm_source=x", PAGE)],
        ["url", "text"],
    )
    (r,) = page_metadata_df(df).collect()
    assert r.title == "Fish & Chips — a guide"
    assert r.description == 'How to fry "properly"'
    assert r.og_title == "OG Fish"  # content-before-property order
    assert r.og_description == "og desc here"
    assert r.canonical == "https://ex.example/guide"  # href-first order
    assert r.lang == "en-gb"
    assert r.noindex is True


def test_absent_fields_are_null(spark):
    df = spark.createDataFrame(
        [("https://ex.example/x", "<html><body>plain</body></html>")],
        ["url", "text"],
    )
    (r,) = page_metadata_df(df).collect()
    assert r.title is None and r.description is None
    assert r.canonical is None and r.og_title is None
    assert r.lang is None and r.noindex is False


def test_canonical_dedup_composition(spark):
    """The use-case: print/mobile variants declare one canonical —
    grouping on coalesce(canonical, canonical_url(url)) collapses
    them where URL normalization alone cannot."""
    from vectra_py_spark.functions.urls import canonical_url

    link = '<link rel="canonical" href="https://ex.example/article">'
    rows = [
        ("https://ex.example/article", f"<html><head>{link}</head></html>"),
        ("https://ex.example/article/print", f"<html><head>{link}</head></html>"),
        ("https://m.ex.example/article", f"<html><head>{link}</head></html>"),
        ("https://other.example/p", "<html><head></head></html>"),
    ]
    df = spark.createDataFrame(rows, ["url", "text"])
    meta = page_metadata_df(df)
    groups = (
        meta.withColumn(
            "dedup_key", F.coalesce("canonical", canonical_url("url"))
        )
        .groupBy("dedup_key")
        .count()
        .collect()
    )
    by_key = {r.dedup_key: r["count"] for r in groups}
    assert by_key["https://ex.example/article"] == 3
    assert by_key["https://other.example/p"] == 1


def test_plan_is_single_codegen_projection(spark):
    """Metadata extraction must stay a codegen projection — no UDF,
    no exchange."""
    df = spark.createDataFrame([("u", "<html></html>")], ["url", "text"])
    plan = (
        page_metadata_df(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
