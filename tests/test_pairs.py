"""Image-text pair mining (`operators/pairs.py`): tag collection,
both quote styles, attribute order, entity unescape, the four URL
resolution forms, scheme drops, the alt-quality gate, pair dedup, and
the all-Catalyst plan shape."""

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.pairs import (
    dedup_image_text_pairs,
    image_text_pairs_df,
)

PAGE = """<html><body>
<img src="cat.jpg" alt="A tabby cat sleeping on a windowsill">
<p>text between</p>
<IMG ALT='Dog chasing a red ball' SRC='https://cdn.example/dog.png'>
<img src="//mirror.example/bird.webp" alt="Bluebird on a branch, closeup" />
<img src="/media/fish.gif" alt="Goldfish &amp; friends in a &quot;tank&quot;">
<img src="data:image/png;base64,AAAA" alt="inline data image, long alt">
<img src="x.png" alt="ok">
<img src="y.png" alt="IMG_1234.jpg">
<img src="z.png">
<img data-src="lazy.png" alt="lazy loaded image without real src">
</body></html>"""

URL = "https://host.example/a/b/page.html?utm=1"


def _pairs(spark, url=URL, html=PAGE, **kw):
    df = spark.createDataFrame([(url, html)], ["url", "text"])
    return image_text_pairs_df(df, **kw).collect()


def test_extraction_and_resolution(spark):
    rows = {r.img_idx: r for r in _pairs(spark)}
    # 0: relative path resolves against the page DIRECTORY, query dropped
    assert rows[0].image_url == "https://host.example/a/b/cat.jpg"
    assert rows[0].caption == "A tabby cat sleeping on a windowsill"
    assert rows[0].caption_words == 7
    # 1: absolute URL + single quotes + ALT-before-SRC + uppercase tag
    assert rows[1].image_url == "https://cdn.example/dog.png"
    assert rows[1].caption == "Dog chasing a red ball"
    # 2: protocol-relative inherits the page scheme
    assert rows[2].image_url == "https://mirror.example/bird.webp"
    # 3: root-relative resolves against the ORIGIN + entity unescape
    assert rows[3].image_url == "https://host.example/media/fish.gif"
    assert rows[3].caption == 'Goldfish & friends in a "tank"'


def test_quality_gate(spark):
    idxs = {r.img_idx for r in _pairs(spark)}
    assert 4 not in idxs  # data: URI
    assert 5 not in idxs  # alt below min_alt_chars
    assert 6 not in idxs  # filename-like alt
    assert 7 not in idxs  # no alt at all
    assert 8 not in idxs  # data-src is not src
    assert idxs == {0, 1, 2, 3}


def test_gate_knobs(spark):
    idxs = {
        r.img_idx
        for r in _pairs(spark, min_alt_chars=1, drop_filenamey=False)
    }
    assert {5, 6} <= idxs  # short + filenamey survive when asked
    assert 7 not in idxs  # absent alt never survives


def test_no_path_page_gets_root_base(spark):
    (r,) = _pairs(
        spark, url="https://host.example",
        html='<img src="p.png" alt="five words of alt text">',
    )
    assert r.image_url == "https://host.example/p.png"


def test_max_alt_gate(spark):
    rows = _pairs(
        spark,
        html=f'<img src="a.png" alt="{"x " * 600}">',
        max_alt_chars=1000,
    )
    assert rows == []


def test_dedup_pairs(spark):
    html = '<img src="https://c.example/i.png" alt="same caption here">'
    df = spark.createDataFrame(
        [(f"https://h{i}.example/p", html) for i in range(3)]
        + [("https://h0.example/q",
            '<img src="https://c.example/i.png" alt="other caption text">')],
        ["url", "text"],
    )
    out = dedup_image_text_pairs(image_text_pairs_df(df)).collect()
    by_cap = {r.caption: r for r in out}
    assert by_cap["same caption here"].n_pages == 3
    assert by_cap["same caption here"].first_page == "https://h0.example/p"
    assert by_cap["other caption text"].n_pages == 1


def test_plan_is_pure_catalyst(spark):
    """The mining pass must stay codegen: no Python evaluation node,
    no shuffle — generator + project + filter only."""
    df = spark.createDataFrame([(URL, PAGE)], ["url", "text"])
    plan = image_text_pairs_df(df)._jdf.queryExecution().executedPlan().toString()
    for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                "Exchange"):
        assert bad not in plan, plan
    assert "Generate" in plan


@pytest.mark.slow
def test_fetch_pacing_enforces_schedule_gaps(spark):
    """r12 review fix: the fetch SLEEPS to honor fetch_at_s, it does
    not merely sort by it. The transport stamps executor-side
    monotonic time into the payload; consecutive same-host slots
    0.25 s apart must observe >= ~0.25 s gaps."""
    import time

    from vectra_py_spark.operators.pairs import fetch_images_df

    sched = spark.createDataFrame(
        [(f"http://one.host/i{k}.png", "one.host", k, 0.25 * k, 0)
         for k in range(3)],
        "image_url string, host string, slot int, fetch_at_s double,"
        " worker int",
    )

    def stamping_transport(url):
        return str(time.monotonic()).encode(), "image/png"

    rows = fetch_images_df(
        sched, transport=stamping_transport, n_workers=1
    ).collect()
    stamps = sorted(float(r.payload.decode()) for r in rows)
    gaps = [b - a for a, b in zip(stamps, stamps[1:])]
    assert all(g >= 0.2 for g in gaps), gaps
    # and pace=False restores the fast replay path
    t0 = time.monotonic()
    fetch_images_df(
        sched, transport=stamping_transport, n_workers=1, pace=False
    ).collect()
    assert time.monotonic() - t0 < 5.0
