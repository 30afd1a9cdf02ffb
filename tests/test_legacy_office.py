"""Legacy PowerPoint (.ppt, [MS-PPT] record tree) and Excel (.xls,
BIFF8 [MS-XLS]) extraction: round trips over both text encodings,
the SST CONTINUE continuation rule, RK packed numbers, encrypted
gates, fuzz, and probe/dispatch/WARC integration."""

import os
import struct
import tempfile

import numpy as np
import pytest

from vectra_py_spark.operators.cfb import encode_cfb
from vectra_py_spark.operators.office import office_extract_text
from vectra_py_spark.operators.ppt import encode_ppt, ppt_extract_text
from vectra_py_spark.operators.xls import (
    _rk_value,
    encode_xls,
    xls_extract_text,
)


def test_ppt_roundtrip_both_atom_kinds():
    slides = [
        ["Title slide", "with body"],
        ["日本語スライド", "ascii line"],
        ["third deck page"],
    ]
    p = encode_ppt(slides)
    want = "\n".join(line for s in slides for line in s)
    assert ppt_extract_text(p) == want
    assert office_extract_text(p) == ("ppt", want)
    # both atom kinds really present (cp1252 AND utf-16)
    assert struct.pack("<HH", 0, 0x0FA8) in p  # TextBytesAtom header
    assert struct.pack("<HH", 0, 0x0FA0) in p  # TextCharsAtom header


def test_ppt_gates_and_malformed():
    enc = encode_cfb([
        ("PowerPoint Document",
         struct.pack("<HHI", 0x000F, 0x2F14, 0)),
    ])
    with pytest.raises(ValueError, match="encrypted .ppt"):
        ppt_extract_text(enc)
    with pytest.raises(ValueError, match="no PowerPoint Document"):
        ppt_extract_text(encode_cfb([("Junk", b"\x00" * 8)]))
    # a record that lies about its length
    bad = encode_cfb([
        ("PowerPoint Document",
         struct.pack("<HHI", 0, 0x0FA0, 9999) + b"hi"),
    ])
    with pytest.raises(ValueError, match="runs past"):
        ppt_extract_text(bad)


def test_xls_roundtrip_and_continue_rule():
    sheets = [
        [["Name", "Qty"], ["alpha", "3"], ["日本語", "4.5"]],
        [["second sheet"]],
    ]
    want = ["Name\tQty\nalpha\t3\n日本語\t4.5", "second sheet"]
    for split in (False, True):
        x = encode_xls(sheets, sst_split=split)
        assert xls_extract_text(x) == want, split
    assert office_extract_text(encode_xls(sheets))[0] == "xls"
    # numbers format cleanly (integers without trailing .0)
    assert xls_extract_text(
        encode_xls([[["1234567", "3.25", "text"]]])
    ) == ["1234567\t3.25\ttext"]


def test_doc_ccptext_cut_is_in_cp_space():
    """ccpText counts UTF-16 code units; after an astral char (2 CPs,
    1 Python char) the main-document cut must not shift and bleed
    header/footnote furniture into the output (ADVICE r8)."""
    import struct as st

    from vectra_py_spark.operators.cfb import CfbReader, encode_cfb
    from vectra_py_spark.operators.doc import (
        _CCP_TEXT_AT,
        doc_extract_text,
        encode_doc,
    )

    # full text stream = main body 'a😀b' (4 CPs) + header furniture
    # 'HDR' (real files park headers past ccpText in the same stream)
    payload = encode_doc(["a\U0001f600bHDR"])
    cfb = CfbReader(payload)
    wd = bytearray(cfb.stream("WordDocument"))
    st.pack_into("<i", wd, _CCP_TEXT_AT, 4)  # main body only
    patched = encode_cfb([
        ("WordDocument", bytes(wd)),
        ("0Table", cfb.stream("0Table")),
    ])
    # char-space slicing would give 'a😀bH' (4 chars); CP-space is right
    assert doc_extract_text(patched) == "a\U0001f600b"


def test_xls_nested_chart_substream_cells_do_not_leak():
    """Cell records inside a nested substream (embedded charts open
    their own BOF/EOF at depth 2) must NOT be attributed to the
    enclosing sheet's grid ([MS-XLS] 2.1.7.20 — ADVICE r8)."""
    import struct as st

    from vectra_py_spark.operators import xls as xm
    from vectra_py_spark.operators.cfb import encode_cfb

    # SST: ["keep", "leak"]; sheet grid holds only "keep"; the chart
    # substream nested inside the sheet carries a LABELSST → "leak"
    # and a NUMBER record that must both be ignored.
    def s(v: str) -> bytes:
        raw = v.encode("latin-1")
        return st.pack("<HB", len(raw), 0x00) + raw

    sst = xm._rec(xm._SST, st.pack("<II", 2, 2) + s("keep") + s("leak"))
    cell_keep = xm._rec(xm._LABELSST, st.pack("<HHHI", 0, 0, 0, 0))
    chart = (
        xm._bof(0x0020)
        + xm._rec(xm._LABELSST, st.pack("<HHHI", 1, 0, 0, 1))
        + xm._rec(xm._NUMBER, st.pack("<HHHd", 2, 0, 0, 42.0))
        + xm._rec(xm._EOF, b"")
    )
    sheet = xm._bof(0x0010) + cell_keep + chart + xm._rec(xm._EOF, b"")

    def boundsheet(pos: int) -> bytes:
        raw = b"Sheet1"
        return xm._rec(
            xm._BOUNDSHEET, st.pack("<IHBB", pos, 0, len(raw), 0) + raw
        )

    for _ in range(2):
        globals_stream = (
            xm._bof(0x0005) + boundsheet(0) + sst + xm._rec(xm._EOF, b"")
        )
        globals_stream = (
            xm._bof(0x0005)
            + boundsheet(len(globals_stream))
            + sst
            + xm._rec(xm._EOF, b"")
        )
    payload = encode_cfb([("Workbook", globals_stream + sheet)])
    assert xls_extract_text(payload) == ["keep"]


def test_xls_rk_values():
    """RK packed-number decode: all four flag combinations against
    the [MS-XLS] 2.5.217 semantics."""
    # 30-bit integer 100 → raw = (100 << 2) | 0x02
    assert _rk_value((100 << 2) | 0x02) == 100.0
    # negative integer
    assert _rk_value(((-7 & 0x3FFFFFFF) << 2) | 0x02) == -7.0
    # integer with /100: 12345 → 123.45
    assert _rk_value((12345 << 2) | 0x03) == 123.45
    # float: high 30 bits of an IEEE double (1.5 has a clean mantissa)
    (bits,) = struct.unpack("<Q", struct.pack("<d", 1.5))
    assert _rk_value((bits >> 32) & 0xFFFFFFFC) == 1.5
    # float with /100
    assert _rk_value(((bits >> 32) & 0xFFFFFFFC) | 0x01) == 0.015
    # an RK cell through the full reader: splice one into a sheet
    x = encode_xls([[["placeholder"]]])
    rk_rec = struct.pack("<HH", 0x027E, 10) + struct.pack(
        "<HHHI", 1, 0, 0, (250 << 2) | 0x03
    )
    eof = struct.pack("<HH", 0x000A, 0)
    # can't byte-splice inside CFB sectors safely; rebuild via encode_cfb
    from vectra_py_spark.operators.cfb import CfbReader

    wb = CfbReader(x).stream("Workbook")
    j = wb.rindex(eof)
    wb2 = wb[:j] + rk_rec + wb[j:]
    x2 = encode_cfb([("Workbook", wb2)])
    assert xls_extract_text(x2) == ["placeholder\n2.5"]


def test_xls_gates_and_malformed():
    x = encode_xls([[["cell"]]])
    from vectra_py_spark.operators.cfb import CfbReader

    wb = CfbReader(x).stream("Workbook")
    # FILEPASS right after the globals BOF → encrypted
    bof_len = 4 + 16
    wb2 = wb[:bof_len] + struct.pack(
        "<HH", 0x002F, 4
    ) + b"\x01\x00\x00\x00" + wb[bof_len:]
    with pytest.raises(ValueError, match="encrypted .xls"):
        xls_extract_text(encode_cfb([("Workbook", wb2)]))
    with pytest.raises(ValueError, match="no Workbook"):
        xls_extract_text(encode_cfb([("Junk", b"\x00" * 8)]))
    # LABELSST pointing past the SST
    wb3 = bytearray(wb)
    k = wb3.index(struct.pack("<HH", 0x00FD, 10))
    struct.pack_into("<I", wb3, k + 4 + 6, 999)
    with pytest.raises(ValueError, match="past the SST"):
        xls_extract_text(encode_cfb([("Workbook", bytes(wb3))]))


def test_legacy_fuzz_valueerror_only():
    import sys

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    import zlib

    for name, base in (
        ("ppt", encode_ppt([["fuzz seed deck", "café 日本"]])),
        ("xls", encode_xls([[["fuzz", "1.5", "日本"]]], sst_split=True)),
    ):
        rng = np.random.default_rng(sum(base) % (2**31))
        for mut in _mutations(base, rng, 300):
            try:
                office_extract_text(mut)
            except ValueError:
                pass
    # campaign regression seeds: a mutated LABELSST body shorter than
    # its struct once escaped as struct.error (xls seed 950988151/146)
    for target, base in (
        ("xls", encode_xls([[["campaign", "1.5", "日本"]]],
                           sst_split=True)),
        ("doc", None),
        ("ppt", encode_ppt([["campaign deck", "café 日本語"]])),
    ):
        if base is None:
            from vectra_py_spark.operators.doc import encode_doc

            base = encode_doc(["campaign legacy body", "café 日本語"])
        rng = np.random.default_rng(
            zlib.crc32((target + "-campaign-r8").encode())
        )
        for mut in _mutations(base, rng, 300):
            try:
                office_extract_text(mut)
            except ValueError:
                pass


def test_legacy_folder_and_warc(spark):
    from vectra_py_spark.operators.office import read_office_documents
    from vectra_py_spark.sources.warc import (
        read_warc,
        synth_warc,
        warc_documents,
    )

    folder = tempfile.mkdtemp()
    with open(os.path.join(folder, "deck.ppt"), "wb") as f:
        f.write(encode_ppt([["legacy deck text"]]))
    with open(os.path.join(folder, "book.xls"), "wb") as f:
        f.write(encode_xls([[["legacy sheet text"]]]))
    docs = {
        os.path.basename(r.uri): r
        for r in read_office_documents(spark, folder).collect()
    }
    assert docs["deck.ppt"].doc_type == "ppt"
    assert docs["deck.ppt"].text == "legacy deck text"
    assert docs["book.xls"].doc_type == "xls"
    assert docs["book.xls"].text == "legacy sheet text"
    wdir = tempfile.mkdtemp()
    with open(os.path.join(wdir, "s.warc"), "wb") as f:
        f.write(synth_warc([
            ("http://ex.org/d.ppt", encode_ppt([["crawled deck"]]),
             "application/vnd.ms-powerpoint"),
            ("http://ex.org/b.xls", encode_xls([[["crawled sheet"]]]),
             "application/vnd.ms-excel"),
        ]))
    out = {r.uri: r for r in warc_documents(read_warc(spark, wdir)).collect()}
    assert out["http://ex.org/d.ppt"].text == "crawled deck"
    assert out["http://ex.org/b.xls"].text == "crawled sheet"
