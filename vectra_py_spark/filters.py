"""Mongo-subset metadata-filter AST → Spark ``Column`` compiler.

Re-expresses the reference's interpreted filter evaluator
(``/root/reference/src/vectra_py/item_selector.py:52-127``, SURVEY.md
§2.2 P1–P11) as a compiled Catalyst expression tree, so predicates push
down into the Parquet scan (row-group skipping + column pruning) instead
of being evaluated row-at-a-time in Python.

Supported operators (Pinecone/Mongo subset, ``custom_types.py:53-64``):

- ``$and`` / ``$or`` — arrays of sub-filters
- ``$eq`` / ``$ne`` — any scalar (int | float | str | bool)
- ``$gt`` / ``$gte`` / ``$lt`` / ``$lte`` — numeric comparisons
- ``$in`` / ``$nin`` — membership in a list of strings/numbers
- plain ``{field: value}`` — implicit ``$eq``
- unknown ``$op`` inside a dict — treated as ``$eq`` (reference fallback,
  ``item_selector.py:125-127``)

Intended-vs-written divergences (SURVEY.md §2.9) resolved toward intent:
the reference's broken dispatch (`metadataFilter`, §2.9.1), inverted
bool guard on ``$in``/``$nin`` (§2.9.2) and int-only numeric guards
(§2.9.3) are implemented as *intended*: membership over non-bool
scalars, comparisons over any number.

**Missing-field semantics (P11)** — the load-bearing divergence from SQL
three-valued logic: the reference rejects an item whose filtered field is
absent for EVERY operator, including ``$ne`` and ``$nin``
(``item_selector.py:97-98``). In SQL, ``col <> 5`` is NULL (filtered out)
for NULL col — which happens to match — but ``NOT col IN (...)`` is also
NULL-out, and a naive ``~isin`` would keep nothing anyway; we make the
rule explicit with ``isNotNull() &`` on every leaf so the compiled tree
is correct under negation/``$or`` composition too.

Scale: a compiled predicate is pure Catalyst — codegen'd, pushed into
the scan, and partition-prunable; zero Python in the executor hot path.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["compile_filter", "FilterCompileError"]

_COMPARISON_OPS = frozenset(
    {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin"}
)
_NUMERIC_OPS = frozenset({"$gt", "$gte", "$lt", "$lte"})


class FilterCompileError(ValueError):
    """Raised for a structurally invalid filter AST."""


ColumnResolver = Callable[[str], Column]


def _default_resolver(field: str) -> Column:
    return F.col(field)


def _require_scalar(op: str, value: Any) -> None:
    if not isinstance(value, (int, float, str, bool)):
        raise FilterCompileError(
            f"{op} requires an int/float/str/bool value, got {type(value).__name__}"
        )


def _require_number(op: str, value: Any) -> None:
    # Intent semantics (SURVEY.md §2.9.3): any number, not just int.
    # bool is an int subclass in Python; the reference's upstream excludes
    # booleans from ordered comparisons.
    if isinstance(value, bool) or not isinstance(value, (int, float)):
        raise FilterCompileError(f"{op} requires a numeric value, got {value!r}")


def _require_membership_list(op: str, value: Any) -> Sequence[Any]:
    if not isinstance(value, (list, tuple)) or any(
        isinstance(v, bool) or not isinstance(v, (int, float, str)) for v in value
    ):
        # Intent semantics (§2.9.2): list of strings/numbers, booleans excluded.
        raise FilterCompileError(f"{op} requires a list of strings/numbers")
    return value


def _leaf(col: Column, op: str, value: Any) -> Column:
    """One comparison with the reference's missing-field rule (P11).

    ``item_selector.py:97-98``: absent metadata never matches, for every
    operator — hence the explicit ``isNotNull() &`` guard.
    """
    if value is None:
        # Reference: a None filter value rejects the item (`select` walks into
        # metadata_filter with value None → every branch returns False).
        return F.lit(False)
    if op == "$eq":
        _require_scalar(op, value)
        cmp = col == F.lit(value)
    elif op == "$ne":
        _require_scalar(op, value)
        cmp = col != F.lit(value)
    elif op in _NUMERIC_OPS:
        _require_number(op, value)
        if op == "$gt":
            cmp = col > F.lit(value)
        elif op == "$gte":
            cmp = col >= F.lit(value)
        elif op == "$lt":
            cmp = col < F.lit(value)
        else:
            cmp = col <= F.lit(value)
    elif op == "$in":
        values = _require_membership_list(op, value)
        cmp = col.isin(*values) if values else F.lit(False)
    elif op == "$nin":
        values = _require_membership_list(op, value)
        cmp = ~col.isin(*values) if values else F.lit(True)
    else:
        # Unknown-op fallback = $eq (`item_selector.py:125-127`).
        _require_scalar(op, value)
        cmp = col == F.lit(value)
    return col.isNotNull() & cmp


def _compile_field(field: str, spec: Any, resolve: ColumnResolver) -> Column:
    col = resolve(field)
    if isinstance(spec, Mapping):
        # {"field": {"$op": v, ...}} — conjunction over the ops in the dict
        # (reference evaluates each key through metadata_filter and ANDs).
        parts = [_leaf(col, op, v) for op, v in spec.items()]
        if not parts:
            raise FilterCompileError(f"empty operator dict for field {field!r}")
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out
    # Plain value — implicit $eq (`item_selector.py:70-72`).
    return _leaf(col, "$eq", spec)


def compile_filter(
    filter_ast: Mapping[str, Any] | None,
    resolve: ColumnResolver | None = None,
) -> Column:
    """Compile a Mongo-subset filter dict to a single boolean ``Column``.

    ``resolve`` maps a field name to a ``Column`` — the default is a plain
    top-level column; index callers pass a resolver that falls back to
    ``metadata[field]`` for non-projected fields (the Spark analog of the
    reference's indexed/side-file metadata split, SURVEY.md §1.1).
    """
    if filter_ast is None or len(filter_ast) == 0:
        return F.lit(True)
    if not isinstance(filter_ast, Mapping):
        raise FilterCompileError(f"filter must be a dict, got {type(filter_ast).__name__}")
    resolve = resolve or _default_resolver

    parts: list[Column] = []
    for key, value in filter_ast.items():
        if key == "$and":
            if not isinstance(value, Sequence) or isinstance(value, (str, bytes)):
                raise FilterCompileError("$and requires a list of filters")
            sub = [compile_filter(f, resolve) for f in value]
            acc = F.lit(True)
            for s in sub:
                acc = acc & s
            parts.append(acc)
        elif key == "$or":
            if not isinstance(value, Sequence) or isinstance(value, (str, bytes)):
                raise FilterCompileError("$or requires a list of filters")
            sub = [compile_filter(f, resolve) for f in value]
            acc = F.lit(False)
            for s in sub:
                acc = acc | s
            parts.append(acc)
        elif key.startswith("$"):
            raise FilterCompileError(f"unknown logical operator {key!r}")
        else:
            parts.append(_compile_field(key, value, resolve))

    out = parts[0]
    for p in parts[1:]:
        out = out & p  # top level is a conjunction (`item_selector.py:57-69`)
    return out


def filter_to_sql(
    filter_ast: Mapping[str, Any] | None,
    field_sql: Callable[[str], str] | None = None,
) -> str:
    """Render the same filter AST as ANSI SQL (for DuckDB oracles/tests).

    Mirrors :func:`compile_filter` exactly, including the P11
    missing-field guard (`field IS NOT NULL AND ...`).
    """
    if filter_ast is None or len(filter_ast) == 0:
        return "TRUE"
    field_sql = field_sql or (lambda f: f)

    def lit(v: Any) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            escaped = v.replace("'", "''")
            return f"'{escaped}'"
        return repr(v)

    def leaf(field: str, op: str, v: Any) -> str:
        f = field_sql(field)
        if v is None:
            return "FALSE"
        if op in ("$eq", "$ne"):
            sym = "=" if op == "$eq" else "<>"
            return f"({f} IS NOT NULL AND {f} {sym} {lit(v)})"
        if op in _NUMERIC_OPS:
            sym = {"$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}[op]
            return f"({f} IS NOT NULL AND {f} {sym} {lit(v)})"
        if op == "$in":
            if not v:
                return "FALSE"
            return f"({f} IS NOT NULL AND {f} IN ({', '.join(lit(x) for x in v)}))"
        if op == "$nin":
            if not v:
                return f"({f} IS NOT NULL)"
            return f"({f} IS NOT NULL AND {f} NOT IN ({', '.join(lit(x) for x in v)}))"
        return f"({f} IS NOT NULL AND {f} = {lit(v)})"

    def walk(ast: Mapping[str, Any]) -> str:
        terms: list[str] = []
        for key, value in ast.items():
            if key == "$and":
                terms.append("(" + " AND ".join(walk(f) for f in value) + ")")
            elif key == "$or":
                terms.append("(" + " OR ".join(walk(f) for f in value) + ")")
            elif isinstance(value, Mapping):
                terms.append(
                    "(" + " AND ".join(leaf(key, op, v) for op, v in value.items()) + ")"
                )
            else:
                terms.append(leaf(key, "$eq", value))
        return "(" + " AND ".join(terms) + ")" if len(terms) > 1 else terms[0]

    return walk(filter_ast)
