"""Property tests: curation/mixing invariants against Python models on
randomized small inputs (word soups, skewed source sizes, waterfill
edge cases)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier

_SPARK = None


def test_bind_session(spark):
    # hypothesis can't take pytest fixtures directly; bind the session
    global _SPARK
    _SPARK = spark
    assert _SPARK is not None


_token_counts = st.lists(
    st.integers(1, 500), min_size=1, max_size=6
)


@settings(max_examples=12, deadline=None)
@given(counts=_token_counts, budget_frac=st.floats(0.1, 3.0),
       max_epochs=st.floats(0.5, 8.0))
def test_property_unimax_waterfill_invariants(counts, budget_frac, max_epochs):
    """Water-filling invariants, independent of the closed form used:
    0 ≤ alloc_i ≤ cap_i; Σ alloc = min(budget, Σ cap) (to rounding);
    all uncapped sources share one waterline."""
    from vectra_py_spark.operators.mixing import unimax_mix

    spark = _SPARK
    rows = [
        (i, f"s{i}", " ".join(["w"] * n)) for i, n in enumerate(counts)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = unimax_mix(
        df, budget_frac=budget_frac, max_epochs=max_epochs
    ).collect()
    total = sum(counts)
    budget = budget_frac * total
    caps = {f"s{i}": max_epochs * n for i, n in enumerate(counts)}
    allocs = {r.source: r.alloc_tokens for r in out}
    assert set(allocs) == set(caps)
    for src, a in allocs.items():
        assert -1e-6 <= a <= caps[src] + 1e-6
    expect_total = min(budget, sum(caps.values()))
    assert math.isclose(sum(allocs.values()), expect_total, rel_tol=1e-6,
                        abs_tol=1e-4)
    # uncapped sources all sit at one waterline
    waterlines = sorted(
        round(a, 4) for src, a in allocs.items()
        if a < caps[src] - 1e-6
    )
    assert len(set(waterlines)) <= 1


_docs = st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]),
             min_size=0, max_size=8),
    min_size=1, max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(docs=_docs)
def test_property_line_dedup_matches_bruteforce(docs):
    """line_dedup_stats agrees with a Python model: a line is boiler
    iff its normalized form appears in >= 2 distinct docs."""
    from vectra_py_spark.operators.curation import line_dedup_stats

    spark = _SPARK
    texts = ["\n".join(" ".join([w, w]) for w in lines) for lines in docs]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup_stats(df).collect()}

    per_doc = [set(" ".join([w, w]) for w in lines) for lines in docs]
    from collections import Counter

    freq = Counter(l for s in per_doc for l in s)
    for i, lines in enumerate(per_doc):
        if not lines:
            assert i not in out  # no non-empty lines -> no row
            continue
        boiler = sum(1 for l in lines if freq[l] >= 2)
        assert out[i].n_lines == len(lines)
        assert out[i].n_boiler == boiler


_lengths = st.lists(st.integers(1, 40), min_size=2, max_size=30)


@settings(max_examples=12, deadline=None)
@given(lengths=_lengths)
def test_property_length_trim_band_model(lengths):
    """length_trim keeps exactly the docs whose percent_rank lies in
    [lo, hi] under the Python percent-rank model (ties share ranks)."""
    from vectra_py_spark.operators.curation import length_trim

    spark = _SPARK
    rows = [(i, "s", n) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    kept = {r.doc_id for r in length_trim(df).collect()}

    n = len(lengths)
    srt = sorted(lengths)
    expect = set()
    for i, v in enumerate(lengths):
        rank = srt.index(v) + 1  # min rank among ties, 1-based
        pr = 0.0 if n == 1 else (rank - 1) / (n - 1)
        if 0.05 <= pr <= 0.95:
            expect.add(i)
    assert kept == expect
