"""Legacy Word .doc extraction (MS-CFB + MS-DOC): container round
trips over both FAT layers (mini + regular + multi-FAT-sector),
piece-table reassembly across cp1252 AND UTF-16 pieces, control-mark
normalization incl. field instruction/result routing, the named
gates (encrypted .doc, .ppt/.xls, encrypted OOXML, pre-97 layout),
the ValueError-only contract + fuzz, and the probe/folder/WARC
integration."""

import os
import struct
import tempfile

import numpy as np
import pytest

from vectra_py_spark.operators.cfb import CfbReader, encode_cfb
from vectra_py_spark.operators.doc import doc_extract_text, encode_doc
from vectra_py_spark.operators.office import office_extract_text

_PARAS = [
    "Hello legacy Word",
    "accented café naïve ±½",
    "CJK 日本語テキスト mixed ascii",
    "plain tail",
]


def test_cfb_container_roundtrip_all_layers():
    small = b"small stream content " * 10   # mini stream (<4096)
    big = bytes(np.random.default_rng(1).integers(0, 256, 10000,
                                                  dtype=np.uint8))
    huge = bytes(np.random.default_rng(2).integers(0, 256, 200000,
                                                   dtype=np.uint8))
    payload = encode_cfb([
        ("WordDocument", big), ("0Table", small), ("T", b"x"),
    ])
    r = CfbReader(payload)
    assert sorted(r.stream_names()) == ["0Table", "T", "WordDocument"]
    assert r.stream("WordDocument") == big
    assert r.stream("0Table") == small and r.stream("T") == b"x"
    # >64 KB forces multiple FAT sectors through the header DIFAT
    assert CfbReader(encode_cfb([("Huge", huge)])).stream("Huge") == huge
    with pytest.raises(ValueError, match="not found"):
        r.stream("Missing")
    with pytest.raises(ValueError, match="not an OLE"):
        CfbReader(b"PK\x03\x04nope")


def test_doc_roundtrip_multi_piece():
    d = encode_doc(_PARAS)
    assert doc_extract_text(d) == "\n".join(_PARAS)
    assert office_extract_text(d) == ("doc", "\n".join(_PARAS))
    # the piece table really has BOTH encodings (≥3 pieces: cp1252 /
    # utf-16 / cp1252), so reassembly is what passed — not one blob
    clx = CfbReader(d).stream("0Table")
    (lcb,) = struct.unpack_from("<I", clx, 1)
    assert (lcb - 4) // 12 >= 3
    assert doc_extract_text(encode_doc([""])) == ""
    assert doc_extract_text(encode_doc(["日"])) == "日"


def test_control_marks_and_fields():
    """Hand-built text with Word control marks routed through a real
    piece table: \\x07 cell marks → tabs, \\x13..\\x15 fields keep the
    RESULT and drop the instruction, pictures/objects drop."""
    raw = (
        "cell a\x07cell b\x07row end\x07"
        "field: \x13 HYPERLINK junk \x14visible result\x15 after"
        "\rpic\x01obj\x08tail"
    )
    d = encode_doc([raw])
    got = doc_extract_text(d)
    assert "cell a\tcell b\trow end\t" in got
    assert "visible result" in got and "HYPERLINK" not in got
    assert "field: " in got and " after" in got
    assert "pic" in got and "obj" in got and "tail" in got
    assert "\x01" not in got and "\x08" not in got


def test_gates_refuse_by_name():
    # encrypted .doc: flip fEncrypted in the FIB
    d = bytearray(encode_doc(["secret"]))
    # find the WordDocument stream start: FIB begins with A5EC
    i = bytes(d).index(b"\xec\xa5")
    d[i + 0x0B] |= 0x01  # fEncrypted = bit 0x0100 of the 0x0A flags
    with pytest.raises(ValueError, match="encrypted .doc"):
        doc_extract_text(bytes(d))
    # sibling OLE formats refuse by name on the DIRECT .doc path
    # (office_extract_text dispatches them to their own extractors)
    for marker, pat in (
        ("PowerPoint Document", "PowerPoint"),
        ("Workbook", "Excel"),
        ("EncryptedPackage", "password-protected OOXML"),
    ):
        p = encode_cfb([(marker, b"\x00" * 64)])
        with pytest.raises(ValueError, match=pat):
            doc_extract_text(p)
    with pytest.raises(ValueError, match="password-protected OOXML"):
        office_extract_text(
            encode_cfb([("EncryptedPackage", b"\x00" * 64)])
        )
    with pytest.raises(ValueError, match="unrecognized OLE"):
        office_extract_text(encode_cfb([("Junk", b"\x00" * 8)]))
    # pre-Word97: no piece table
    d2 = bytearray(encode_doc(["x"]))
    i = bytes(d2).index(b"\xec\xa5")
    struct.pack_into("<I", d2, i + 0x01A6, 0)  # lcbClx = 0
    with pytest.raises(ValueError, match="piece table"):
        doc_extract_text(bytes(d2))
    # wrong wIdent
    d3 = bytearray(encode_doc(["x"]))
    i = bytes(d3).index(b"\xec\xa5")
    d3[i] = 0x00
    with pytest.raises(ValueError):
        doc_extract_text(bytes(d3))


def test_malformed_contract_and_fuzz():
    import sys

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    base = encode_doc(_PARAS)
    for cut in (8, 100, 512, len(base) // 2):
        with pytest.raises(ValueError):
            doc_extract_text(base[:cut])
    rng = np.random.default_rng(20260815)
    for mut in _mutations(base, rng, 400):
        try:
            doc_extract_text(mut)
        except ValueError:
            pass


def test_probe_folder_and_warc(spark):
    from vectra_py_spark.operators.office import read_office_documents
    from vectra_py_spark.operators.probe import probe_payload
    from vectra_py_spark.sources.warc import (
        read_warc,
        synth_warc,
        warc_documents,
    )

    d = encode_doc(["legacy memo body"])
    assert probe_payload(d) == {"kind": "doc"}
    assert probe_payload(
        encode_cfb([("Workbook", b"\x00" * 8)])
    ) == {"kind": "xls"}
    with pytest.raises(ValueError, match="Word/PowerPoint/Excel"):
        probe_payload(encode_cfb([("Junk", b"\x00" * 8)]))
    folder = tempfile.mkdtemp()
    with open(os.path.join(folder, "m.doc"), "wb") as f:
        f.write(d)
    docs = read_office_documents(spark, folder).collect()
    assert len(docs) == 1 and docs[0].doc_type == "doc"
    assert docs[0].text == "legacy memo body"
    wdir = tempfile.mkdtemp()
    with open(os.path.join(wdir, "s.warc"), "wb") as f:
        f.write(synth_warc([
            ("http://ex.org/old.doc", d, "application/msword"),
            ("http://ex.org/bad.doc", d[:64], "application/msword"),
        ]))
    out = {r.uri: r for r in warc_documents(read_warc(spark, wdir)).collect()}
    assert set(out) == {"http://ex.org/old.doc"}
    assert out["http://ex.org/old.doc"].doc_type == "doc"
    assert out["http://ex.org/old.doc"].text == "legacy memo body"
