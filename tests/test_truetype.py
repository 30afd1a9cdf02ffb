"""TrueType cmap reader/writer (`operators/truetype.py`) and the PDF
Type0-without-/ToUnicode extraction path it unlocks: round-trips over
both format-4 layouts and format 12, the CIDToGIDMap stream variant,
the named refusal gates, and the ValueError-only malformed contract."""

import struct

import numpy as np
import pytest

from vectra_py_spark.operators.truetype import (
    cmap_code_to_gid,
    cmap_gid_to_unicode,
    encode_truetype_cmap,
)

_MAP = {
    ord("a"): 1, ord("b"): 2, ord("c"): 3,  # consecutive run
    ord("Z"): 9,                            # isolated
    0x4E2D: 11, 0x6587: 12,                 # CJK
}


def test_cmap_roundtrip_both_format4_layouts():
    for ro in (False, True):
        f = encode_truetype_cmap(_MAP, use_range_offset=ro)
        assert cmap_code_to_gid(f) == _MAP, ro
        inv = cmap_gid_to_unicode(f)
        assert inv[1] == "a" and inv[9] == "Z" and inv[11] == "中"


def test_cmap_format12_astral():
    m = {**_MAP, 0x1F600: 20, 0x1F601: 21, 0x1D11E: 30}
    f = encode_truetype_cmap(m)
    assert cmap_code_to_gid(f) == m
    inv = cmap_gid_to_unicode(f)
    assert inv[20] == "\U0001f600" and inv[30] == "\U0001d11e"


def test_shared_glyph_lowest_code_wins():
    f = encode_truetype_cmap({65: 5, 66: 5, 97: 7})
    assert cmap_gid_to_unicode(f) == {5: "A", 7: "a"}


def test_refusals_by_name():
    with pytest.raises(ValueError, match="ttcf"):
        cmap_code_to_gid(b"ttcf" + b"\x00" * 32)
    with pytest.raises(ValueError, match="not an sfnt"):
        cmap_code_to_gid(b"XXXX" + b"\x00" * 32)
    with pytest.raises(ValueError, match="shorter than an sfnt"):
        cmap_code_to_gid(b"\x00\x01")
    # a valid sfnt with no cmap table
    no_cmap = struct.pack(">IHHHH", 0x00010000, 1, 0, 0, 0) + struct.pack(
        ">4sIII", b"head", 0, 28, 4
    ) + b"\x00" * 4
    with pytest.raises(ValueError, match="no cmap"):
        cmap_code_to_gid(no_cmap)
    # cmap present but only an unsupported subtable format (format 2)
    sub = struct.pack(">HHH", 2, 6, 0)
    cm = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub
    font = struct.pack(">IHHHH", 0x00010000, 1, 0, 0, 0) + struct.pack(
        ">4sIII", b"cmap", 0, 28, len(cm)
    ) + cm
    with pytest.raises(ValueError, match="no format 0/4/12"):
        cmap_code_to_gid(font)


def test_malformed_contract_valueerror_only():
    good = encode_truetype_cmap(_MAP)
    rng = np.random.default_rng(20260901)
    for _ in range(400):
        mut = bytearray(good)
        kind = rng.integers(0, 3)
        if kind == 0:  # byte flips
            for _ in range(int(rng.integers(1, 8))):
                mut[int(rng.integers(0, len(mut)))] = int(
                    rng.integers(0, 256)
                )
        elif kind == 1:  # truncation
            mut = mut[: int(rng.integers(0, len(mut)))]
        else:  # splice
            i = int(rng.integers(0, len(mut)))
            mut = mut[:i] + bytes(rng.integers(0, 256, 16)) + mut[i:]
        try:
            cmap_gid_to_unicode(bytes(mut))
        except ValueError:
            pass  # the only allowed escape


def test_pdf_type0_without_tounicode_all_flavors():
    """The unlocked PDF path: Identity-H, no /ToUnicode, text
    recovered from the embedded font program across every container
    flavor and under encryption."""
    from vectra_py_spark.operators.pdf import encode_pdf, pdf_extract_text

    pages = [["mixed latin 和 中文 text", "line two ψφ"], ["page two 文字"]]
    want = ["mixed latin 和 中文 text\nline two ψφ", "page two 文字"]
    for xref_stream, objstm in ((False, False), (True, True)):
        b = encode_pdf(
            pages, font="type0", to_unicode=False,
            xref_stream=xref_stream, objstm=objstm,
        )
        assert pdf_extract_text(b) == want
    b = encode_pdf(
        pages, font="type0", to_unicode=False,
        encrypt="o", encrypt_mode="aesv2",
    )
    assert b"\xe4\xb8\xad" not in b  # no plaintext CJK in ciphertext
    assert pdf_extract_text(b) == want
    # astral chars route through the format-12 subtable
    b2 = encode_pdf([["emoji 😀 and 𝄞"]], font="type0", to_unicode=False)
    assert pdf_extract_text(b2) == ["emoji 😀 and 𝄞"]


def test_pdf_cidtogid_stream_variant():
    """/CIDToGIDMap as a STREAM (not /Identity): build it by patching
    the fixture — CIDs permute to different GIDs, the font cmap maps
    the permuted GIDs, extraction must honor the table."""
    from vectra_py_spark.operators.pdf import encode_pdf, pdf_extract_text

    text = "abc"
    b = encode_pdf([[text]], font="type0", to_unicode=False,
                   compress=False)
    # fixture: cid_of = {a:1, b:2, c:3}, font cmap maps code→gid==cid.
    # Re-point gids via a permutation table gid' = 4-cid and rebuild
    # the font so its cmap carries the permuted gids.
    from vectra_py_spark.operators.truetype import encode_truetype_cmap

    perm_font = encode_truetype_cmap(
        {ord("a"): 3, ord("b"): 2, ord("c"): 1}
    )
    # locate the uncompressed FontFile2 stream and replace it
    from vectra_py_spark.operators.pdf import _Pdf

    old = _Pdf(b)
    # find the object carrying the old font program
    old_font = None
    for num in old.objs:
        v = old.obj(num)
        if isinstance(v, tuple) and v[0] == "stream" and v[2][:4] in (
            b"\x00\x01\x00\x00",
        ):
            old_font = v[2]
    assert old_font is not None
    cidmap = struct.pack(">HHHH", 0, 3, 2, 1)  # cid 1→3, 2→2, 3→1
    patched = b.replace(old_font, perm_font)
    patched = patched.replace(
        b"/CIDToGIDMap /Identity",
        b"/CIDToGIDMap %d 0 R" % 100,
    )
    # append object 100 (the map stream) + rebuild nothing: the scan
    # fallback finds appended objects; sever startxref to force it
    patched = patched[: patched.rfind(b"startxref")] + (
        b"\n100 0 obj\n<< /Length %d >>\nstream\n" % len(cidmap)
        + cidmap + b"\nendstream\nendobj\n"
    )
    assert pdf_extract_text(patched) == [text]


def test_pdf_refusals_stay_named():
    """Absent/Type1 font programs refuse by name; an sfnt-flavored
    /FontFile3 (OpenType with TrueType outlines) extracts through the
    same cmap path; the predefined-CMap gate is unchanged."""
    from vectra_py_spark.operators.pdf import encode_pdf, pdf_extract_text

    b = encode_pdf([["abc"]], font="type0", to_unicode=False,
                   compress=False)
    with pytest.raises(ValueError, match="FontFile2"):
        pdf_extract_text(b.replace(b"/FontFile2", b"/FontFileX"))
    # /FontFile3 carrying an sfnt payload routes through the cmap path
    assert pdf_extract_text(
        b.replace(b"/FontFile2", b"/FontFile3")
    ) == ["abc"]
    with pytest.raises(ValueError, match="Type1 /FontFile"):
        pdf_extract_text(b.replace(b"/FontFile2", b"/FontFile "))
    with pytest.raises(ValueError, match="unsupported /Encoding"):
        pdf_extract_text(
            b.replace(b"/Identity-H", b"/UniJIS-H ")
        )
