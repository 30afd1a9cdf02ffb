"""Local mini-oracle mirroring the driver's correctness compare.

Driver parity notes (learned from CORRECTNESS_r02):
- The driver materializes BOTH sides as pandas frames (Spark via
  ``toPandas()``-equivalent collect, DuckDB via ``.df()``), sorts the
  columns by name, row-sorts with ``DataFrame.sort_values`` over all
  columns, then hashes the *string form of each cell as pandas typed it*.
- There is NO int->float coercion: DuckDB ``SUM(BIGINT)`` returns
  HUGEINT, which pandas materializes as float64, so its cells stringify
  as ``"4568.0"`` while Spark's BIGINT stringifies as ``"4568"`` — a
  hash mismatch even though the values are numerically identical.
  (Fix the SQL with ``CAST(... AS BIGINT)``, not the harness.)
- Array-typed result columns make ``sort_values`` raise
  ``TypeError: unhashable type`` — the driver records an ``err`` row.
  This harness re-raises the same way so array outputs fail loudly
  locally instead of being silently stringified.

Keep this STRICTER-or-equal to the driver, never looser.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pandas as pd

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


def canon_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by every column — exactly the
    driver's canonicalization. Raises TypeError on unhashable (array)
    cells, like the driver does."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return pdf


def frame_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Stringify each cell exactly as pandas typed it — no numeric
    normalization, so dtype drift (int64 vs float64) is VISIBLE."""
    return [
        tuple(str(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def compare(spark, sf_dir: str, spark_df, sql: str):
    """Return (ok, detail) comparing the Spark result to the DuckDB oracle
    under driver-equivalent canonicalization."""
    spdf = spark_df.toPandas()

    con = duckdb_conn(sf_dir)
    try:
        dpdf = con.execute(sql).df()
    finally:
        con.close()

    if sorted(spdf.columns) != sorted(dpdf.columns):
        return False, (
            f"schema mismatch: spark={sorted(spdf.columns)} "
            f"duckdb={sorted(dpdf.columns)}"
        )
    if len(spdf) != len(dpdf):
        return False, f"rowcount mismatch: spark={len(spdf)} duckdb={len(dpdf)}"

    # Any TypeError here (unhashable array cells) must propagate — the
    # driver records it as an err row, so the local sweep must fail too.
    srows = frame_rows(canon_frame(spdf))
    drows = frame_rows(canon_frame(dpdf))

    if srows != drows:
        diff = [
            (s, d) for s, d in zip(srows, drows) if s != d
        ][:5]
        extra = ""
        if diff:
            extra = "\n".join(f" spark={s}\n  duck={d}" for s, d in diff)
        return False, f"value mismatch (first diffs):\n{extra}"
    return True, f"ok ({len(srows)} rows)"
