"""HTML table extraction (`operators/tables.py`): the stack machine
over messy real-world markup (implicit closes, nesting, colspan,
entities), markdown linearization, and both Spark surfaces."""

import pytest

from vectra_py_spark.operators.tables import (
    extract_tables,
    table_rows_df,
    tables_df,
    tables_to_markdown,
)


def test_basic_table_with_header():
    html = """
    <table>
      <tr><th>Name</th><th>Qty</th></tr>
      <tr><td>apples &amp; pears</td><td>3</td></tr>
      <tr><td>plums</td><td>5</td></tr>
    </table>"""
    (t,) = extract_tables(html)
    assert t["header"] is True
    assert t["n_rows"] == 3 and t["n_cols"] == 2
    assert t["rows"][0] == ["Name", "Qty"]
    assert t["rows"][1] == ["apples & pears", "3"]


def test_implicit_closes_and_whitespace():
    # real-world markup: no </td>, no </tr>, inline tags in cells
    html = (
        "<table><tr><td>a <b>bold</b>\n  text<td>b"
        "<tr><td>c<td>d</table>"
    )
    (t,) = extract_tables(html)
    assert t["rows"] == [["a bold text", "b"], ["c", "d"]]
    assert t["header"] is False


def test_nested_table_flattens_and_colspan_expands():
    html = (
        "<table><tr><td>outer "
        "<table><tr><td>inner</td></tr></table>"
        "</td><td>x</td></tr>"
        '<tr><td colspan="2">wide</td></tr></table>'
    )
    (t,) = extract_tables(html)
    assert len(extract_tables(html)) == 1  # nested not top-level
    assert t["rows"][0] == ["outer inner", "x"]
    assert t["rows"][1] == ["wide", "wide"]  # colspan duplication
    assert t["n_cols"] == 2


def test_multiple_tables_and_ragged_padding():
    html = (
        "<p>pre</p><table><tr><td>1</td><td>2</td><td>3</td></tr>"
        "<tr><td>only</td></tr></table>"
        "<table><tr><td>solo</td></tr></table>"
    )
    t1, t2 = extract_tables(html)
    assert t1["rows"][1] == ["only", "", ""]  # padded to n_cols
    assert t2["rows"] == [["solo"]]
    assert extract_tables("<p>no tables here</p>") == []
    # script content never yields phantom tables
    assert extract_tables(
        "<script>var t = '<table><tr><td>x'</script>"
    ) == []


def test_tables_to_markdown():
    html = (
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
    )
    (md,) = tables_to_markdown(html)
    assert md.splitlines() == [
        "| A | B |", "| --- | --- |", "| 1 | 2 |",
    ]
    (md2,) = tables_to_markdown("<table><tr><td>x</td></tr></table>")
    assert md2.splitlines()[0] == "|  |"  # blank header row


def test_spark_surfaces(spark):
    html = (
        "<table><tr><th>H</th></tr><tr><td>v1</td></tr>"
        "<tr><td>v2</td></tr></table>"
    )
    df = spark.createDataFrame(
        [("https://e.example/t", html), ("https://e.example/none", "<p>x</p>")],
        ["url", "text"],
    )
    tabs = tables_df(df).collect()
    assert len(tabs) == 1
    assert tabs[0].n_rows == 3 and tabs[0].header
    assert tabs[0].rows[1] == ["v1"]
    rows = table_rows_df(df).collect()
    assert len(rows) == 3
    by_idx = {r.row_idx: r for r in rows}
    assert by_idx[0].is_header and by_idx[0].cells == ["H"]
    assert not by_idx[2].is_header and by_idx[2].cells == ["v2"]
