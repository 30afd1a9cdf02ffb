"""Property test: `asof_join` agrees with a brute-force Python model on
randomized small inputs (keys collide, timestamps tie across sides)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vectra_py_spark.operators.asof import asof_join

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier

_pair = st.tuples(st.integers(0, 3), st.integers(0, 20))
_left = st.lists(_pair, min_size=1, max_size=12)
_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(-9, 9)),
    max_size=12,
)

_SPARK = None


def _get_spark(spark):
    global _SPARK
    _SPARK = spark
    return spark


def test_bind_session(spark):
    # hypothesis can't take pytest fixtures directly; bind the session
    assert _get_spark(spark) is not None


@settings(max_examples=15, deadline=None)
@given(left=_left, right=_right)
def test_property_asof_matches_bruteforce(left, right):
    spark = _SPARK
    # unique (key, ts) on the right: which equal-ts row wins is undefined
    seen = set()
    rded = []
    for u, t, v in right:
        if (u, t) not in seen:
            seen.add((u, t))
            rded.append((u, t, float(v)))
    ldf = spark.createDataFrame(
        [(u, t, float(i)) for i, (u, t) in enumerate(left)],
        "user_id long, t_us long, value double",
    )
    rdf = spark.createDataFrame(
        rded or [(99, 0, 0.0)], "user_id long, t_us long, value double"
    )
    got = {
        (r["user_id"], r["t_us"], r["value"]): (r["asof_t_us"], r["asof_value"])
        for r in asof_join(ldf, rdf).collect()
    }
    expected = {}
    for i, (u, t) in enumerate(left):
        prior = [r for r in (rded or [(99, 0, 0.0)]) if r[0] == u and r[1] <= t]
        best = max(prior, key=lambda r: r[1], default=None)
        expected[(u, t, float(i))] = (
            (best[1], best[2]) if best else (None, None)
        )
    assert got == expected
