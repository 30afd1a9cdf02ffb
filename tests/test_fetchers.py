"""File fetcher, distributed directory ingest, HTML→markdown."""

from __future__ import annotations

import os
import tempfile

import pytest

from vectra_py_spark.sources.fetchers import (
    FileFetcher,
    fetch_directory_df,
    html_to_markdown,
)


@pytest.fixture(scope="module")
def tree():
    d = tempfile.mkdtemp()
    os.makedirs(f"{d}/sub")
    with open(f"{d}/a.md", "w") as fh:
        fh.write("# Title\n\nBody text.")
    with open(f"{d}/sub/b.py", "w") as fh:
        fh.write("def f():\n    return 1\n")
    with open(f"{d}/noext", "w") as fh:
        fh.write("plain")
    yield d
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def test_file_fetcher_single(tree):
    out = FileFetcher().fetch(f"{tree}/a.md")
    assert len(out) == 1
    uri, text, doc_type = out[0]
    assert text.startswith("# Title")
    assert doc_type == "md"


def test_file_fetcher_directory_recurses(tree):
    # §2.9.8: the reference's recursion discarded results; intent keeps them
    out = FileFetcher().fetch(tree)
    assert len(out) == 3
    types = {os.path.basename(u): t for u, _, t in out}
    assert types["a.md"] == "md"
    assert types["b.py"] == "py"
    assert types["noext"] is None


def test_fetch_directory_df_distributed(spark, tree):
    df = fetch_directory_df(spark, tree)
    rows = {os.path.basename(r.uri): r for r in df.collect()}
    assert set(rows) == {"a.md", "b.py", "noext"}
    assert rows["a.md"].doc_type == "md"
    assert rows["noext"].doc_type is None
    assert rows["b.py"].text.startswith("def f()")


HTML = """
<html><head><title>T</title><style>.x{color:red}</style>
<script>alert(1)</script></head>
<body>
<h1>Main Heading</h1>
<p>First paragraph with a <a href="/rel">relative link</a>.</p>
<h2>Sub</h2>
<ul><li>one</li><li>two</li></ul>
<!-- comment -->
<p>Second &amp; final.</p>
</body></html>
"""


def test_html_to_markdown():
    md = html_to_markdown(HTML, base_url="https://ex.com/page/")
    assert "# Main Heading" in md
    assert "## Sub" in md
    assert "- one" in md and "- two" in md
    assert "[relative link](https://ex.com/rel)" in md
    assert "alert(1)" not in md  # script dropped
    assert "color:red" not in md  # style dropped
    assert "comment" not in md
    assert "Second & final." in md  # entities unescaped
    assert "\n\n\n" not in md  # blank-line collapse


class _FakeResp:
    def __init__(self, text, ctype, status=200):
        self.text = text
        self.headers = {"Content-Type": ctype}
        self.status_code = status

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")


def test_web_fetcher_html_to_md(monkeypatch):
    from vectra_py_spark.sources import fetchers as f

    seen = {}

    def fake_get(uri, headers=None, timeout=None):
        seen["headers"] = headers
        return _FakeResp("<h1>Hi</h1><p>Body</p>", "text/html; charset=utf-8")

    import requests

    monkeypatch.setattr(requests, "get", fake_get)
    uri, text, doc_type = f.WebFetcher().fetch("https://ex.com/page")
    assert doc_type == "md" and "# Hi" in text
    # reference's browser-like header discipline (web_fetcher.py:16-29)
    assert "Mozilla" in seen["headers"]["User-Agent"]


def test_web_fetcher_content_type_allowlist(monkeypatch):
    from vectra_py_spark.sources import fetchers as f

    import requests

    monkeypatch.setattr(
        requests, "get",
        lambda *a, **k: _FakeResp(b"\x00", "application/octet-stream"),
    )
    with pytest.raises(ValueError, match="disallowed content type"):
        f.WebFetcher().fetch("https://ex.com/blob.bin")


def test_web_fetcher_raises_on_error_status(monkeypatch):
    from vectra_py_spark.sources import fetchers as f

    import requests

    monkeypatch.setattr(
        requests, "get", lambda *a, **k: _FakeResp("x", "text/plain", 503)
    )
    with pytest.raises(RuntimeError, match="HTTP 503"):
        f.WebFetcher().fetch("https://ex.com/down")


def test_fetch_uris_df_records_errors(spark, monkeypatch, tree):
    """Bulk fetch keeps failing rows with fetch_error populated."""
    from vectra_py_spark.sources.fetchers import fetch_uris_df

    df = spark.createDataFrame(
        [("https://nonexistent.invalid/x",)], ["uri"]
    )
    out = fetch_uris_df(df, timeout=0.5).collect()
    assert len(out) == 1
    assert out[0].text is None
    assert out[0].fetch_error  # connection error recorded, row kept


def test_fetch_directory_df_invalid_utf8_file(spark, tree):
    """ADVICE r9 (high, same family): one non-UTF-8 file in the tree
    must not fail the whole binaryFile scan — bytes decode with
    replacement chars, matching FileFetcher's errors='replace'."""
    raw = b"caf\xe9 not utf-8 \xff"
    with open(f"{tree}/legacy.txt", "wb") as fh:
        fh.write(raw)
    rows = {os.path.basename(r.uri): r
            for r in fetch_directory_df(spark, tree).collect()}
    assert rows["legacy.txt"].text == raw.decode("utf-8", "replace")
    assert rows["a.md"].text.startswith("# Title")
