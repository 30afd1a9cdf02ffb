"""Subtitle parsing + clip alignment (`operators/subtitles.py`):
SRT and WebVTT grammars, the forgiving block scanner, quarantine
rows, the half-open alignment join, and its equi-join plan shape."""

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.subtitles import (
    align_cues_to_frames,
    parse_cues,
    subtitle_cues_df,
)

SRT = """1
00:00:01,000 --> 00:00:04,000
Hello there.

2
00:00:04,500 --> 00:00:06,250
Second line,
wrapped over two rows.

not-a-cue block without arrow

3
00:01:00,000 --> 00:01:02,000
Third cue.
"""

VTT = """﻿WEBVTT Kind: captions

NOTE a comment block
that spans lines

intro-cue-id
00:01.000 --> 00:04.000 align:start position:10%
<c.yellow>Hello</c> <00:00:02.000>there.

00:00:05.000 --> 00:00:04.000
backwards cue is dropped

01:02:03.500 --> 01:02:04.000
With explicit hours.
"""


def test_parse_srt():
    cues = parse_cues(SRT)
    assert cues[0] == (0, 1000, 4000, "Hello there.")
    assert cues[1] == (1, 4500, 6250, "Second line, wrapped over two rows.")
    assert cues[2] == (2, 60000, 62000, "Third cue.")
    assert len(cues) == 3


def test_parse_vtt():
    cues = parse_cues(VTT)
    # BOM + header + NOTE skipped; cue id line tolerated; inline
    # markup and karaoke timestamps stripped; mm:ss.mmm form; the
    # backwards cue dropped; explicit-hours form parsed
    assert cues[0] == (0, 1000, 4000, "Hello there.")
    assert cues[1] == (1, 3723500, 3724000, "With explicit hours.")
    assert len(cues) == 2


def test_parse_rejects_none():
    with pytest.raises(ValueError):
        parse_cues(None)


def test_garbage_degrades_to_zero_cues():
    assert parse_cues("complete nonsense\n\nmore nonsense") == []
    assert parse_cues("") == []


def test_cues_df_and_quarantine(spark):
    df = spark.createDataFrame(
        [("a", SRT), ("b", "no cues here"), ("c", None)],
        ["media_id", "text"],
    )
    rows = subtitle_cues_df(df).collect()
    a = sorted(
        (r for r in rows if r.media_id == "a"), key=lambda r: r.cue_idx
    )
    assert [r.cue_text for r in a] == [
        "Hello there.",
        "Second line, wrapped over two rows.",
        "Third cue.",
    ]
    assert all(r.error is None for r in a)
    assert [r for r in rows if r.media_id == "b"] == []  # 0 cues, 0 rows
    (c,) = [r for r in rows if r.media_id == "c"]
    assert c.error is not None and c.cue_idx is None


def test_align_half_open(spark):
    cues = subtitle_cues_df(
        spark.createDataFrame([("v", SRT)], ["media_id", "text"])
    )
    # 2 fps → frame_ms = idx * 500; cue0 = [1000, 4000)
    frames = spark.createDataFrame(
        [("v", i) for i in range(16)] + [("other", 3)],
        ["media_id", "frame_idx"],
    )
    out = align_cues_to_frames(cues, frames, fps=2.0).collect()
    by_cue = {}
    for r in out:
        by_cue.setdefault(r.cue_idx, set()).add(r.frame_ms)
    # cue0 [1000,4000): 1000,1500,...,3500 — 4000 EXCLUDED (half-open)
    assert by_cue[0] == {1000, 1500, 2000, 2500, 3000, 3500}
    # cue1 [4500,6250): 4500..6000
    assert by_cue[1] == {4500, 5000, 5500, 6000}
    # cue2 starts at 60000 — no sampled frame reaches it
    assert 2 not in by_cue
    assert all(r.media_id == "v" for r in out)


def test_fuzz_parse_never_raises_on_text():
    """The forgiving-scanner contract: ANY unicode text yields a cue
    list (possibly empty) with sequential indices, start < end, and
    non-empty text — never an exception. Mirrors the codec fuzz
    harness's ValueError-only rule for binary decoders."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=400))
    def prop(text):
        cues = parse_cues(text)
        for i, (idx, s, e, t) in enumerate(cues):
            assert idx == i and s < e and t

    prop()


def test_fuzz_srt_roundtrip():
    """Synthesized well-formed SRT parses back to exactly the cues it
    was built from."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    span = st.tuples(
        st.integers(0, 3_599_000), st.integers(1, 5_000),
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"), blacklist_characters="<>&"
            ),
            min_size=1, max_size=40,
        ).filter(lambda t: t.strip() and "-->" not in t),
    )

    def fmt(ms):
        return (
            f"{ms // 3600000:02d}:{ms // 60000 % 60:02d}:"
            f"{ms // 1000 % 60:02d},{ms % 1000:03d}"
        )

    @settings(max_examples=100, deadline=None)
    @given(st.lists(span, max_size=5))
    def prop(spans):
        blocks, want = [], []
        t0 = 0
        for k, (gap, dur, text) in enumerate(spans):
            s, e = t0 + gap, t0 + gap + dur
            t0 = e
            blocks.append(f"{k + 1}\n{fmt(s)} --> {fmt(e)}\n{text.strip()}")
            # the parser collapses ASCII space/tab runs only — NBSP
            # and other Zs code points are cue CONTENT
            import re
            want.append(
                (len(want), s, e, re.sub(r"[ \t]+", " ", text.strip()))
            )
        got = parse_cues("\n\n".join(blocks))
        assert got == want

    prop()


def test_align_plan_is_equi_join(spark):
    """The span predicate must ride an equi-join on the media id —
    never a broadcast nested loop over frame rows."""
    cues = subtitle_cues_df(
        spark.createDataFrame([("v", SRT)], ["media_id", "text"])
    )
    frames = spark.createDataFrame(
        [("v", i) for i in range(4)], ["media_id", "frame_idx"]
    )
    plan = (
        align_cues_to_frames(cues, frames, fps=2.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_align_id_col_applies_to_both_sides(spark):
    """id_col renames the media id on the CUES side too (ADVICE r11:
    it used to bind frames only), and a cue table without an `error`
    column participates whole."""
    cues = spark.createDataFrame(
        [("v", 0, 1000, 2000, "hello")],
        ["clip", "cue_idx", "start_ms", "end_ms", "cue_text"],
    )
    frames = spark.createDataFrame(
        [("v", i) for i in range(8)], ["clip", "frame_idx"]
    )
    out = align_cues_to_frames(cues, frames, fps=2.0, id_col="clip")
    got = {r.frame_ms for r in out.collect()}
    assert got == {1000, 1500}
