"""Boilerplate removal (`operators/boilerplate.py`): block
segmentation features, jusText-style classification incl. the context
pass and heading rescue, and the Spark mapInPandas surface."""

import pytest

from vectra_py_spark.operators.boilerplate import (
    classify_blocks,
    extract_main_text,
    main_content_df,
    page_blocks,
)

PARA1 = (
    "It was the considered view of the committee that the proposal "
    "should be adopted in full, and that the budget which came with "
    "it ought to be approved by all of the members who were present "
    "at the meeting, because the alternative would have been to do "
    "nothing at all and that was not an option any of them wanted."
)
PARA2 = (
    "The second reading of the bill was just as contentious as the "
    "first had been, and most of the members who spoke did so with "
    "the clear intention of being heard rather than of persuading "
    "anyone, which is how these things tend to go when the outcome "
    "is already known to everyone in the room before it starts."
)

PAGE = f"""
<html><head><title>t</title>
<script>var x = navigate_menu_items_config;</script>
<style>.nav {{color: red}}</style>
</head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<div>Accept cookies?</div>
<h1>The Committee Report</h1>
<p>{PARA1}</p>
<p>{PARA2}</p>
<div><a href="/rel1">Related story one</a> <a href="/rel2">Related story two</a></div>
<footer>Copyright 2026 SiteName <a href="/tos">Terms</a></footer>
</body></html>
"""


def test_page_blocks_features():
    blocks = page_blocks(PAGE)
    texts = [b["text"] for b in blocks]
    assert any(PARA1 in t for t in texts)
    # script/style bodies never surface as blocks
    assert not any("navigate_menu_items_config" in t for t in texts)
    assert not any("color: red" in t for t in texts)
    nav = next(b for b in blocks if "Home" in b["text"])
    assert nav["link_density"] > 0.8
    para = next(b for b in blocks if PARA1 in b["text"])
    assert para["link_density"] == 0.0
    assert para["stopword_density"] > 0.32
    head = next(b for b in blocks if b["text"] == "The Committee Report")
    assert head["is_heading"]


def test_classify_and_extract_main_text():
    text, kept, total = extract_main_text(PAGE)
    assert PARA1 in text and PARA2 in text
    # heading rescued by the following GOOD paragraph
    assert "The Committee Report" in text
    # chrome is gone
    for junk in ("Home", "Accept cookies", "Related story", "Copyright"):
        assert junk not in text
    assert 0 < kept < total


def test_all_chrome_page_yields_empty():
    page = (
        '<nav><a href="/">Home</a><a href="/x">X</a></nav>'
        "<footer>Copyright</footer>"
    )
    text, kept, total = extract_main_text(page)
    assert text == "" and kept == 0 and total >= 1


def test_context_pass_promotes_short_between_good():
    # a SHORT block sandwiched between two GOOD paragraphs is content
    page = f"<p>{PARA1}</p><p>A short aside.</p><p>{PARA2}</p>"
    blocks = page_blocks(page)
    labels = classify_blocks(blocks)
    assert labels == ["good", "good", "good"]
    # the same short block surrounded by BAD stays bad
    page2 = (
        '<div><a href="/a">lots</a><a href="/b">of</a><a href="/c">links</a></div>'
        "<p>A short aside.</p>"
        '<div><a href="/d">more</a><a href="/e">links</a><a href="/f">here</a></div>'
    )
    labels2 = classify_blocks(page_blocks(page2))
    assert labels2[1] == "bad"


def test_main_content_df(spark):
    df = spark.createDataFrame(
        [("https://ex.example/a", PAGE), ("https://ex.example/b", "<nav><a href='/'>Home</a> only chrome</nav>")],
        ["url", "text"],
    )
    got = {r.url: r for r in main_content_df(df).collect()}
    a = got["https://ex.example/a"]
    assert PARA1 in a.main_text
    assert a.n_blocks_kept > 0 and a.n_blocks >= a.n_blocks_kept
    assert 0.0 < a.boiler_ratio < 1.0
    b = got["https://ex.example/b"]
    assert b.main_text == "" and b.boiler_ratio == 1.0
