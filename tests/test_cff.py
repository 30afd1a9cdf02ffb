"""CFF charset reader/writer (`operators/cff.py`) and the PDF
Type0-without-/ToUnicode CFF (/FontFile3) extraction path: round-trips
over standard-SID and custom-string names, all charset formats, the
CID-keyed refusal, and the ValueError-only malformed contract."""

import struct

import numpy as np
import pytest

from vectra_py_spark.operators.cff import (
    cff_gid_to_name,
    cff_gid_to_unicode,
    encode_cff_charset,
)

_NAMES = ["a", "b", "Z", "uni4E2D", "adieresis", "u1F600"]


def test_charset_roundtrip_mixed_sids():
    f = encode_cff_charset(_NAMES)
    assert cff_gid_to_name(f) == {
        1: "a", 2: "b", 3: "Z", 4: "uni4E2D", 5: "adieresis",
        6: "u1F600",
    }
    assert cff_gid_to_unicode(f) == {
        1: "a", 2: "b", 3: "Z", 4: "中", 5: "ä", 6: "\U0001f600",
    }


def test_charset_formats_1_and_2():
    """Range-encoded charsets: consecutive SIDs collapse to ranges —
    build them by hand over the writer's format-0 skeleton."""
    f0 = encode_cff_charset(["a", "b", "c", "d"])  # SIDs 66..69
    # locate the format-0 charset (\x00 + 4 u16 SIDs) and swap it for
    # format 1 (one range) / format 2 — same byte length is required
    # for the fixed offsets, so pad with a second zero-length range
    cs0 = b"\x00" + b"".join(struct.pack(">H", s) for s in (66, 67, 68, 69))
    assert cs0 in f0
    # same byte length is required (fixed offsets); the parser stops
    # once n_glyphs SIDs are read, so trailing pad bytes are inert
    cs1 = b"\x01" + struct.pack(">HB", 66, 3) + b"\x00" * 5
    assert len(cs1) == len(cs0)
    got = cff_gid_to_name(f0.replace(cs0, cs1))
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}
    cs2 = b"\x02" + struct.pack(">HH", 66, 3) + b"\x00" * 4
    assert len(cs2) == len(cs0)
    got = cff_gid_to_name(f0.replace(cs0, cs2))
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_unsafe_sid_block_omitted_never_guessed():
    """SIDs 96-390 (Latin-1 supplement / Expert names) have no safe
    table here — glyphs pointing there must be OMITTED, not mapped."""
    f = encode_cff_charset(["a", "b"])
    cs0 = b"\x00" + struct.pack(">HH", 66, 67)
    patched = f.replace(
        cs0, b"\x00" + struct.pack(">HH", 66, 200)
    )
    assert cff_gid_to_name(patched) == {1: "a"}


def test_cid_keyed_refuses_by_name():
    """A Top DICT carrying /ROS (op 12 30) is a CID-keyed font: the
    charset holds CIDs, not names — must refuse, never mis-map."""
    f = encode_cff_charset(["a"])
    # the writer's Top DICT is charset(15) + CharStrings(17), each a
    # 5-byte int32 operand; build a dict that prepends ROS operands
    # (3 SIDs) + the (12,30) escape op, through the module helpers
    i = f.index(b"\x1d")
    ros = b"\x8b\x8b\x8b\x0c\x1e"  # three small ints + (12,30)
    from vectra_py_spark.operators import cff as cm

    td = ros + f[i : i + 12]
    top_index = cm._mk_index([td])
    name_index = cm._mk_index([b"SynthCFF"])
    empty = cm._mk_index([])
    payload = bytes([1, 0, 4, 4]) + name_index + top_index + empty + empty
    with pytest.raises(ValueError, match="CID-keyed"):
        cff_gid_to_name(payload)


def test_campaign_regression_seed_negative_offsets():
    """Pinned fuzz-campaign seed: mutated DICT integer operands went
    NEGATIVE and escaped as struct.error / IndexError through the
    charset and INDEX walks (found on the campaign's first cff run,
    mutations 4/46/149/264). Contract: ValueError only."""
    import sys
    import zlib

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    payload = encode_cff_charset(["a", "Z", "uni4E2D", "adieresis",
                                  "u1F600"])
    seed = zlib.crc32(b"cff_charset-campaign-r8")
    rng = np.random.default_rng(seed)
    for mut in _mutations(payload, rng, 300):
        try:
            cff_gid_to_unicode(mut)
        except ValueError:
            pass


def test_malformed_contract_valueerror_only():
    good = encode_cff_charset(_NAMES)
    rng = np.random.default_rng(20260902)
    for _ in range(400):
        mut = bytearray(good)
        kind = rng.integers(0, 3)
        if kind == 0:
            for _ in range(int(rng.integers(1, 8))):
                mut[int(rng.integers(0, len(mut)))] = int(
                    rng.integers(0, 256)
                )
        elif kind == 1:
            mut = mut[: int(rng.integers(0, len(mut)))]
        else:
            i = int(rng.integers(0, len(mut)))
            mut = mut[:i] + bytes(rng.integers(0, 256, 16)) + mut[i:]
        try:
            cff_gid_to_unicode(bytes(mut))
        except ValueError:
            pass


def test_pdf_type0_cff_fontfile3_all_flavors():
    from vectra_py_spark.operators.pdf import encode_pdf, pdf_extract_text

    pages = [["mixed latin 和 中文", "line two ψφ"], ["page two 😀"]]
    want = ["mixed latin 和 中文\nline two ψφ", "page two 😀"]
    for xref_stream, objstm in ((False, False), (True, True)):
        b = encode_pdf(
            pages, font="type0", to_unicode=False, font_program="cff",
            xref_stream=xref_stream, objstm=objstm,
        )
        assert pdf_extract_text(b) == want
    b = encode_pdf(
        pages, font="type0", to_unicode=False, font_program="cff",
        encrypt="o", encrypt_mode="rc4",
    )
    assert pdf_extract_text(b) == want
