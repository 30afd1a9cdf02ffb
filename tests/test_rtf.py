"""RTF extraction: writer/reader round trips over all three text
paths (plain ASCII, code-page hex escapes, \\uN unicode with
fallback), destination skipping (font/color/info tables, field
instructions vs. results, \\bin runs, starred destinations), the
\\ucN fallback-skip semantics, negative-\\uN wraparound, malformed
contract + fuzz, and the dispatch/probe/WARC integration."""

import os
import tempfile

import numpy as np
import pytest

from vectra_py_spark.operators.office import office_extract_text
from vectra_py_spark.operators.rtf import encode_rtf, rtf_extract_text


def test_roundtrip_three_text_paths():
    paras = [
        "Hello plain ASCII",
        "accented café naïve ±½",          # cp1252 hex escapes
        "CJK 日本語テキスト",                 # \uN? escapes
        "tab\there and\nline",
        "braces {x} and back\\slash",
    ]
    r = encode_rtf(paras)
    assert rtf_extract_text(r) == "\n".join(paras)
    # a different code page: cyrillic rides \'hh through cp1251
    r2 = encode_rtf(["привет мир"], codepage=1251)
    assert rb"\ansicpg1251" in r2 and rtf_extract_text(r2) == (
        "привет мир"
    )
    assert office_extract_text(r)[0] == "rtf"


def test_destinations_and_fallback_semantics():
    doc = (
        b"{\\rtf1\\ansi{\\fonttbl{\\f0 Junk Font Name;}}"
        b"{\\colortbl;\\red1\\green2\\blue3;}\\uc1 "
        b"{\\field{\\*\\fldinst HYPERLINK \"http://x\"}"
        b"{\\fldrslt visible link}} "
        b"\\uc2\\u26085 ZZafter \\bin5 XXXXXtail}"
    )
    got = rtf_extract_text(doc)
    # skip-destinations drop whole: no font names, no colors, no
    # field INSTRUCTIONS — but the field RESULT text stays
    assert "Junk" not in got and "HYPERLINK" not in got
    assert "visible link" in got
    # \uc2: the two literal fallback chars after ☈5 are dropped
    assert "日after" in got and "ZZ" not in got
    # \binN skips exactly N raw bytes
    assert "tail" in got and "XXXXX" not in got
    # negative \uN wraps per spec (signed 16-bit)
    assert rtf_extract_text(b"{\\rtf1 \\u-1524 Z}") == chr(64012)
    # \line, \tab, \cell, \row mappings
    assert rtf_extract_text(
        b"{\\rtf1 a\\tab b\\line c\\cell d\\row e}"
    ) == "a\tb\nc\td\ne"


def test_malformed_contract_and_fuzz():
    import sys

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    for bad in (b"", b"not rtf at all", b"{\\rtf1 \\'gq}",
                b"{\\rtf1 \\"):
        with pytest.raises(ValueError):
            rtf_extract_text(bad)
    # deep nesting bomb refuses, does not recurse/hang
    with pytest.raises(ValueError, match="deep"):
        rtf_extract_text(b"{\\rtf1 " + b"{" * 400)
    # tail-truncated crawl payloads still salvage decoded text
    full = encode_rtf(["salvage me please", "second paragraph"])
    got = rtf_extract_text(full[:-10])
    assert "salvage me please" in got
    rng = np.random.default_rng(777)
    for mut in _mutations(full, rng, 300):
        try:
            rtf_extract_text(mut)
        except ValueError:
            pass


def test_probe_and_folder_source(spark):
    from vectra_py_spark.operators.office import read_office_documents
    from vectra_py_spark.operators.probe import probe_payload

    assert probe_payload(encode_rtf(["x"]))["kind"] == "rtf"
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "m.rtf"), "wb") as f:
        f.write(encode_rtf(["memo body text"]))
    docs = read_office_documents(spark, d).collect()
    assert len(docs) == 1 and docs[0].doc_type == "rtf"
    assert docs[0].text == "memo body text"


def test_warc_rtf_glue(spark):
    from vectra_py_spark.sources.warc import (
        read_warc,
        synth_warc,
        warc_documents,
    )

    d = tempfile.mkdtemp()
    with open(os.path.join(d, "s.warc"), "wb") as f:
        f.write(synth_warc([
            ("http://ex.org/memo.rtf", encode_rtf(["rtf memo body"]),
             "application/rtf"),
            ("http://ex.org/broken.rtf", b"{\\rtf1 \\'gq}", "text/rtf"),
        ]))
    docs = {r.uri: r for r in warc_documents(read_warc(spark, d)).collect()}
    assert set(docs) == {"http://ex.org/memo.rtf"}
    assert docs["http://ex.org/memo.rtf"].doc_type == "rtf"
    assert docs["http://ex.org/memo.rtf"].text == "rtf memo body"


def test_review_findings_uc_clamp_and_uppercase_words():
    """Review findings: a negative \\ucN must not make the fallback
    skip negative-truthy and silently eat all following text, and
    control words with UPPERCASE letters (legal per the spec grammar)
    must not leak word residue into the output."""
    got = rtf_extract_text(b"{\\rtf1\\ansi\\uc-1\\u65 Hello world}")
    assert got == "AHello world"
    got = rtf_extract_text(
        b"{\\rtf1\\ansi Hello \\XeTeXcharclass5 world}"
    )
    assert got == "Hello world"
    # uppercase destination-style word in a group: unknown → ignored
    got = rtf_extract_text(b"{\\rtf1 a{\\UPPER b}c}")
    assert got == "abc"
