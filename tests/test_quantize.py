"""SQ8 scalar quantization: round-trip error bound + ranking fidelity."""

from __future__ import annotations

import pytest

from vectra_py_spark.operators import quantize as qz
from vectra_py_spark.operators import similarity as sim

VECS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.99, 0.1, 0.0, 0.0]),
    (3, [0.0, 1.0, 0.0, 0.0]),
    (4, [-1.0, 0.0, 0.0, 0.0]),
    (5, [0.3, -0.7, 0.2, 0.5]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding"])


def test_sq8_codes_in_range_and_roundtrip_bounded(vecs):
    params = qz.sq8_params(vecs, dim=4).collect()[0]
    mins, scales = params.mins, params.scales
    codes = {r.vec_id: r.codes for r in qz.sq8_quantize(vecs, dim=4).collect()}
    raw = dict(VECS)
    for vid, cs in codes.items():
        assert all(0 <= c <= 255 for c in cs)
        for d, c in enumerate(cs):
            recon = mins[d] + c * scales[d]
            # affine round-trip error is at most half a quantization step
            assert abs(recon - raw[vid][d]) <= scales[d] / 2 + 1e-12


def test_sq8_constant_dim_is_identity(spark):
    df = spark.createDataFrame(
        [(1, [0.5, 2.0]), (2, [0.5, 3.0])], ["vec_id", "embedding"]
    )
    p = qz.sq8_params(df, dim=2).collect()[0]
    assert p.scales[0] == 1.0  # constant dim: guard scale, code 0
    codes = {r.vec_id: r.codes for r in qz.sq8_quantize(df, dim=2).collect()}
    assert codes[1][0] == 0 and codes[2][0] == 0
    assert p.mins[0] + 0 * p.scales[0] == 0.5


def test_sq8_topk_preserves_wellseparated_ranking(vecs):
    q = [1.0, 0.0, 0.0, 0.0]
    exact = [r.vec_id for r in sim.cosine_topk(vecs, q, k=2).collect()]
    quant = [r.vec_id for r in qz.sq8_topk(vecs, q, k=2).collect()]
    assert quant == exact == [1, 2]
    scores = {r.vec_id: r.score for r in qz.sq8_topk(vecs, q, k=5).collect()}
    # quantization error is visible but small
    assert scores[1] == pytest.approx(1.0, abs=0.02)
    assert scores[4] == pytest.approx(-1.0, abs=0.02)
