"""Property test: `concat_chunk` invariants on randomized corpora —
the emitted spans tile the concatenated token stream exactly: every
sequence except the last carries exactly seq_len tokens, per-doc spans
cover [0, n) contiguously, and global sequence ids are dense."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from vectra_py_spark.operators.packing import concat_chunk

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier

L = 8

_docs = st.lists(st.integers(0, 20), min_size=1, max_size=12)

_SPARK = None


def test_bind_session(spark):
    global _SPARK
    _SPARK = spark
    assert _SPARK is not None


@settings(max_examples=12, deadline=None)
@given(lens=_docs)
def test_property_concat_chunk_tiles_exactly(lens):
    spark = _SPARK
    rows = [(i + 1, " ".join(["w"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = [tuple(r) for r in concat_chunk(df, seq_len=L, shard_size=3).collect()]
    total = sum(lens)
    if total == 0:
        assert out == []
        return
    # per-doc spans contiguous and complete
    per_doc = defaultdict(list)
    for d, s, a, b in out:
        assert 0 <= a < b  # non-empty, ordered
        per_doc[d].append((s, a, b))
    for i, n in enumerate(lens):
        if n == 0:
            assert (i + 1) not in per_doc
            continue
        spans = sorted(per_doc[i + 1])
        assert spans[0][1] == 0 and spans[-1][2] == n
        for (s1, _, e1), (s2, a2, _) in zip(spans, spans[1:]):
            assert e1 == a2 and s2 == s1 + 1  # contiguous doc + seq ids
    # per-sequence token budgets: all full except the last
    per_seq = defaultdict(int)
    for _, s, a, b in out:
        per_seq[s] += b - a
    n_seq = (total + L - 1) // L
    assert set(per_seq) == set(range(n_seq))  # dense ids
    for s, cnt in per_seq.items():
        if s < n_seq - 1:
            assert cnt == L
        else:
            assert cnt == total - L * (n_seq - 1)
