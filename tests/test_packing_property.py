"""Property test: `pack_sequences` invariants hold on randomized
inputs — every doc packed exactly once, budgets never exceeded,
offsets contiguous, and FFD never uses more bins than naive
one-doc-per-bin or fewer than the volume lower bound."""

from __future__ import annotations

import math
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from vectra_py_spark.operators.packing import pack_sequences

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier

BUDGET = 16

_docs = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(1, 24)),
    min_size=1,
    max_size=14,
)

_SPARK = None


def test_bind_session(spark):
    global _SPARK
    _SPARK = spark
    assert _SPARK is not None


@settings(max_examples=12, deadline=None)
@given(docs=_docs)
def test_property_packing_invariants(docs):
    spark = _SPARK
    rows = [
        (i, grp, " ".join(["w"] * n)) for i, (grp, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = pack_sequences(df, budget=BUDGET).collect()

    assert sorted(r.doc_id for r in out) == list(range(len(docs)))

    fill = defaultdict(list)
    for r in out:
        assert 1 <= r.n_used <= BUDGET
        assert r.n_used == min(r.n_tokens, BUDGET)
        fill[(r.grp, r.seq_id)].append((r.offset, r.n_used))
    for rows_ in fill.values():
        rows_.sort()
        pos = 0
        for off, used in rows_:
            assert off == pos
            pos += used
        assert pos <= BUDGET

    # bin-count sanity per group: volume lower bound ≤ bins ≤ n_docs
    per_grp_used = defaultdict(int)
    per_grp_docs = defaultdict(int)
    for r in out:
        per_grp_used[r.grp] += r.n_used
        per_grp_docs[r.grp] += 1
    for grp, used in per_grp_used.items():
        bins = len({k for k in fill if k[0] == grp})
        assert math.ceil(used / BUDGET) <= bins <= per_grp_docs[grp]
