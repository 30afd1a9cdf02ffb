"""Local mini-oracle mirroring the driver's correctness compare:
run the Spark plan and the DuckDB SQL on the same parquet dir, sort
columns by name, and compare order-insensitive normalized row multisets.
"""

from __future__ import annotations

import math
from pathlib import Path

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb float-representation noise beyond comparison precision
        return round(v, 9)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(str(_norm_cell(r[i])) for i in order) for r in rows
    )


def compare(spark, sf_dir: str, spark_df, sql: str):
    """Return (ok, detail) comparing the Spark result to the DuckDB oracle."""
    sdf = spark_df
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    if sorted(scols) != sorted(dcols):
        return False, f"schema mismatch: spark={sorted(scols)} duckdb={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"rowcount mismatch: spark={len(srows)} duckdb={len(drows)}"
    sm = rows_multiset(scols, srows)
    dm = rows_multiset(dcols, drows)
    if sm != dm:
        diff_s = [r for r in sm if r not in dm][:5]
        diff_d = [r for r in dm if r not in sm][:5]
        return False, f"value mismatch:\n spark-only={diff_s}\n duck-only={diff_d}"
    return True, f"ok ({len(srows)} rows)"
