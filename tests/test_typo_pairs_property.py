"""Property test: `typo_pairs` equals brute-force Levenshtein ≤ 1 on
randomized term sets — the deletion-neighborhood candidate generation
must be COMPLETE (every true ≤1 pair shares a variant) and the verify
must be exact (no ≥2 pair survives)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectra_py_spark.operators import dedup as dd

pytestmark = pytest.mark.slow  # excluded from the smoke tier

_terms = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=5),
    min_size=2,
    max_size=10,
    unique=True,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# the session-scoped `spark` fixture rides alongside @given directly
# (only function-scoped fixtures trip hypothesis's health check), so
# this test is runnable in isolation and under any test ordering
@settings(max_examples=25, deadline=None)
@given(terms=_terms)
def test_typo_pairs_equal_brute_force(spark, terms):
    want = {
        (a, b)
        for a in terms
        for b in terms
        if a < b and _lev(a, b) <= 1
    }
    df = spark.createDataFrame([(t,) for t in terms], ["term"])
    got = {(r.term_a, r.term_b) for r in dd.typo_pairs(df).collect()}
    assert got == want


def test_typo_pairs_rejects_max_dist_other_than_one(spark):
    """The single-deletion neighborhood is complete ONLY for distance
    1 — max_dist=2 would silently drop true pairs, so both the
    DataFrame op and its SQL twin must refuse loudly."""
    import pytest

    df = spark.createDataFrame([("abc",), ("abd",)], ["term"])
    for bad in (0, 2, 3):
        with pytest.raises(ValueError, match="max_dist"):
            dd.typo_pairs(df, max_dist=bad)
        with pytest.raises(ValueError, match="max_dist"):
            dd.typo_pairs_sql("(SELECT 'x' AS t)", max_dist=bad)
