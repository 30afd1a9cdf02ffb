"""Column-level function library (vector math, text analysis).

Everything here is a pure Catalyst expression builder — no Python UDFs in
the hot path — so plans stay inside whole-stage codegen and survive
predicate pushdown / column pruning at 100 TB.
"""

from vectra_py_spark.functions.vector import (
    cosine_similarity,
    cosine_to_query,
    dot,
    l2_norm,
    normalized_cosine,
    to_double_array,
    vector_literal,
)

__all__ = [
    "cosine_similarity",
    "cosine_to_query",
    "dot",
    "l2_norm",
    "normalized_cosine",
    "to_double_array",
    "vector_literal",
]
