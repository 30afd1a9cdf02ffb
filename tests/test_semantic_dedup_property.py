"""Property test: `semantic_dedup` survivors equal a brute-force
numpy reference of the documented rule (drop iff an earlier same-cell
row has rounded cosine >= tau) on randomized vector sets."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vectra_py_spark.operators import similarity as sim

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier

DIM = 6
TAU = 0.7

_vecs = st.lists(
    st.lists(
        st.floats(-1, 1, allow_nan=False, allow_infinity=False, width=32),
        min_size=DIM,
        max_size=DIM,
    ),
    min_size=2,
    max_size=12,
)

_SPARK = None


def test_bind_session(spark):
    global _SPARK
    _SPARK = spark
    assert _SPARK is not None


def _reference_survivors(vecs, cents):
    M = np.array(vecs, dtype=np.float64)
    C = np.array(cents, dtype=np.float64)
    dots = M @ C.T
    # argmax dot, ties -> lower cid (numpy argmax takes first max)
    cells = dots.argmax(axis=1)
    nrm = np.linalg.norm(M, axis=1)
    nrm[nrm == 0.0] = 1.0
    U = M / nrm[:, None]
    simm = np.round(U @ U.T, 6)
    keep = []
    for j in range(len(vecs)):
        dropped = any(
            cells[i] == cells[j] and simm[i, j] >= TAU for i in range(j)
        )
        if not dropped:
            keep.append(j + 1)  # ids are 1-based below
    return set(keep)


@settings(max_examples=10, deadline=None)
@given(vecs=_vecs)
def test_property_semantic_dedup_matches_reference(vecs):
    spark = _SPARK
    cents = sim.seeded_centroids(DIM, 3, seed=99)
    df = spark.createDataFrame(
        [(i + 1, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    got = {
        r.vec_id
        for r in sim.semantic_dedup(
            df, threshold=TAU, centroids=cents, extra_cols=()
        ).collect()
    }
    assert got == _reference_survivors(
        [[float(x) for x in v] for v in vecs], cents
    )
