"""HTML table extraction — the structured-data complement to
boilerplate removal: pages carry data in ``<table>`` markup that a
text pipeline either mines as rows (for tabular corpora and QA-pair
generation) or linearizes as markdown (so an LLM corpus keeps the
information instead of dropping the tag soup). Reference tie-in: the
reference's HTML→markdown step (`document_fetcher.py`) flattens
tables to word soup; this operator preserves their geometry.

Parsing is a single-pass stack machine over the table-structural tags
(``table``/``tr``/``td``/``th``) — real-world HTML omits closing
``</td>``/``</tr>`` constantly, so cells close implicitly on the next
structural token, exactly as the HTML5 tree-construction rules say.
NESTED tables flatten into their containing cell's text (depth
tracking; only depth-1 structure is collected — the pragmatic
corpus-mining choice). ``colspan`` expands by duplicating the cell
value so every row of a table has aligned columns; ``rowspan`` is
recorded but NOT expanded (documented one-pass simplification).

Spark surface: narrow ``mapInPandas`` per page — payloads never
shuffle, the universal extractor shape here.
"""

from __future__ import annotations

import html as _html
import re

__all__ = [
    "extract_tables",
    "tables_to_markdown",
    "tables_df",
    "table_rows_df",
]

_TOKEN_RE = re.compile(r"<(/?)(table|tr|td|th)\b([^>]*)>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_COLSPAN_RE = re.compile(r"""colspan\s*=\s*["']?(\d+)""", re.I)
_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.I | re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)


def _cell_text(fragment: str) -> str:
    return _WS_RE.sub(
        " ", _html.unescape(_TAG_RE.sub(" ", fragment))
    ).strip()


def extract_tables(html_text: str, max_tables: int = 1000) -> list[dict]:
    """HTML → [{rows: [[cell, ...], ...], n_rows, n_cols,
    header: bool}] for each top-level table, in document order.
    ``header`` is True when the first row was all-``<th>``. Cells
    close implicitly on the next structural tag (HTML5 rules); a
    ``colspan`` duplicates its value to keep columns aligned."""
    s = _COMMENT_RE.sub("", html_text)
    s = _SCRIPT_RE.sub("", s)
    tables: list[dict] = []
    depth = 0
    rows: list[list[str]] = []
    row: list[str] | None = None
    row_is_th: list[bool] = []
    first_row_th: bool | None = None
    cell_start: int | None = None
    cell_span = 1
    cell_is_th = False

    def close_cell(end: int) -> None:
        nonlocal cell_start, cell_span, row
        if cell_start is not None and row is not None:
            text = _cell_text(s[cell_start:end])
            row.extend([text] * max(1, cell_span))
            row_is_th.append(cell_is_th)
        cell_start = None
        cell_span = 1

    def close_row() -> None:
        nonlocal row, first_row_th
        if row is not None:
            if row:
                rows.append(row)
                if first_row_th is None:
                    first_row_th = bool(row_is_th) and all(row_is_th)
            row = None
        row_is_th.clear()

    for m in _TOKEN_RE.finditer(s):
        closing, tag, attrs = m.group(1), m.group(2).lower(), m.group(3)
        if tag == "table":
            if not closing:
                if depth == 0:
                    rows, row, first_row_th = [], None, None
                    cell_start = None
                depth += 1
            else:
                depth = max(0, depth - 1)
                if depth == 0:
                    close_cell(m.start())
                    close_row()
                    if rows and len(tables) < max_tables:
                        n_cols = max(len(r) for r in rows)
                        tables.append({
                            "rows": [
                                r + [""] * (n_cols - len(r)) for r in rows
                            ],
                            "n_rows": len(rows),
                            "n_cols": n_cols,
                            "header": bool(first_row_th),
                        })
            continue
        if depth != 1:
            continue  # nested-table structure flattens into the cell
        if tag == "tr":
            close_cell(m.start())
            if not closing:
                close_row()
                row = []
            else:
                close_row()
        elif tag in ("td", "th"):
            close_cell(m.start())
            if not closing:
                if row is None:
                    row = []  # row-less cell: implicit <tr>
                cell_start = m.end()
                cell_is_th = tag == "th"
                cm = _COLSPAN_RE.search(attrs)
                cell_span = (
                    max(1, min(100, int(cm.group(1)))) if cm else 1
                )
    return tables


def tables_to_markdown(html_text: str) -> list[str]:
    """Each top-level table linearized as GitHub-style markdown (the
    corpus-friendly form: geometry preserved, tags gone). Tables
    without a ``<th>`` header row get a blank header so the pipe
    table stays well-formed."""
    out: list[str] = []
    for t in extract_tables(html_text):
        rows = t["rows"]
        if t["header"]:
            head, body = rows[0], rows[1:]
        else:
            head, body = [""] * t["n_cols"], rows
        lines = [
            "| " + " | ".join(head) + " |",
            "| " + " | ".join(["---"] * t["n_cols"]) + " |",
        ]
        lines += ["| " + " | ".join(r) + " |" for r in body]
        out.append("\n".join(lines))
    return out


def tables_df(df, html_col: str = "text", url_col: str = "url"):
    """(url, html) rows → one row per extracted table:
    (url, table_idx, n_rows, n_cols, header, rows) with rows as
    ``array<array<string>>``. Narrow mapInPandas."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            recs = {k: [] for k in (
                "url", "table_idx", "n_rows", "n_cols", "header", "rows",
            )}
            for url, html_text in zip(pdf[url_col], pdf[html_col]):
                if html_text is None:
                    continue
                for i, t in enumerate(extract_tables(str(html_text))):
                    recs["url"].append(str(url))
                    recs["table_idx"].append(i)
                    recs["n_rows"].append(t["n_rows"])
                    recs["n_cols"].append(t["n_cols"])
                    recs["header"].append(t["header"])
                    recs["rows"].append(t["rows"])
            # empty batches: a default-constructed empty column is
            # float64, which Arrow cannot cast to array<array<string>>
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in recs.items()}
            )

    return df.select(url_col, html_col).mapInPandas(
        run,
        schema=(
            "url STRING, table_idx INT, n_rows INT, n_cols INT, "
            "header BOOLEAN, rows ARRAY<ARRAY<STRING>>"
        ),
    )


def table_rows_df(df, html_col: str = "text", url_col: str = "url"):
    """The flat form: (url, table_idx, row_idx, is_header, cells) —
    one output row per TABLE ROW, the shape downstream SQL joins and
    per-column analyses want."""
    from pyspark.sql import functions as F

    t = tables_df(df, html_col=html_col, url_col=url_col)
    return t.select(
        "url", "table_idx", "header",
        F.posexplode("rows").alias("row_idx", "cells"),
    ).select(
        "url", "table_idx", "row_idx",
        (F.col("header") & (F.col("row_idx") == 0)).alias("is_header"),
        "cells",
    )
