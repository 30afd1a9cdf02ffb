"""PDF text extraction: writer/reader round-trips (compressed and
plain, classic xref tables AND PDF 1.5 xref streams with predictor +
object streams), incremental-update /Prev chains, hybrid /XRefStm
files, the xref-first offset resolution that defeats in-stream 'N G
obj' shadowing, declared gates (encryption, composite fonts), the
ValueError-only malformed contract + fuzz, Flate-bomb quarantine, the
Spark per-page operator with quarantine, probe integration, and the
WARC application/pdf glue."""

import os
import tempfile
import zlib

import numpy as np
import pytest

from vectra_py_spark.operators.pdf import (
    encode_pdf,
    extract_pdf_text_df,
    pdf_extract_text,
    pdf_info,
    synth_pdf,
)
from vectra_py_spark.operators.probe import probe_payload


def test_roundtrip_compressed_and_plain():
    pages = [["alpha beta", "gamma"], ["second page only line"], [""]]
    for compress in (True, False):
        got = pdf_extract_text(encode_pdf(pages, compress=compress))
        assert got[0] == "alpha beta\ngamma"
        assert got[1] == "second page only line"
        assert got[2] == ""
    info = pdf_info(synth_pdf(4, 2))
    assert info["version"] == "1.4" and info["n_pages"] == 4


def test_string_syntax_edge_cases():
    """Escapes, balanced parens, octal, hex strings, TJ arrays, the
    quote operators — hand-built content streams through the real
    lexer."""
    tricky = [
        "parens (nested (deep)) ok",
        "back\\slash and \\(escaped\\)".replace("\\\\", "\\"),
        "tab\there",
    ]
    got = pdf_extract_text(encode_pdf([tricky]))
    assert "nested (deep)" in got[0]
    assert "tab\there" in got[0]

    # hand-built: TJ array with kerning numbers + hex string + ' op
    content = (
        b"BT /F1 12 Tf 72 720 Td [(Hel) -30 (lo)] TJ "
        b"T* <20576F726C64> Tj (next) ' ET"
    )
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    got = pdf_extract_text(body)
    assert got == ["Hello\n World\nnext"]


def test_xref_stream_flavors_extract_identically():
    """PDF 1.5 cross-reference streams (FlateDecode + PNG Up predictor
    12) and compressed object streams must extract the exact same text
    as the classic-table flavor — the invariant the pdf_extract oracle
    leans on."""
    pages = [[f"page {p} line {i}" for i in range(p + 2)] for p in range(3)]
    ref = pdf_extract_text(encode_pdf(pages))
    for compress in (False, True):
        for objstm in (False, True):
            b = encode_pdf(
                pages, compress=compress, xref_stream=True, objstm=objstm
            )
            assert b.startswith(b"%PDF-1.5")
            assert b"trailer" not in b  # really no classic table
            assert pdf_extract_text(b) == ref
            assert pdf_info(b)["n_pages"] == 3
    # objstm without an xref stream has nowhere to put type-2 entries
    with pytest.raises(ValueError, match="objstm"):
        encode_pdf(pages, objstm=True)


def test_incremental_update_prev_chain():
    """An appended update section (newer xref with /Prev to the old
    one) must win for the objects it redefines — newest-first claim
    order through the chain. Object layout of encode_pdf: 1=font,
    2=content stream, 3=page, 4=pages, 5=catalog."""
    import re as _re

    base = encode_pdf([["v1 text"]], compress=False)
    assert pdf_extract_text(base) == ["v1 text"]
    new_stream = b"BT /F1 12 Tf 14 TL 72 760 Td (v2 text) Tj ET"
    upd = bytearray(base)
    off2 = len(upd)
    upd += (
        b"2 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(new_stream), new_stream)
    )
    old_xref = int(_re.search(rb"startxref\s+(\d+)", base).group(1))
    xref_at = len(upd)
    upd += b"xref\n0 1\n0000000000 65535 f \n2 1\n%010d 00000 n \n" % off2
    upd += (
        b"trailer\n<< /Size 6 /Root 5 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (old_xref, xref_at)
    )
    assert pdf_extract_text(bytes(upd)) == ["v2 text"]


def test_hybrid_xrefstm_precedence():
    """Hybrid-reference file (ISO 32000 §7.5.8.4): a classic table
    whose trailer names an /XRefStm — the stream's entries must beat
    both the table's and the /Prev chain's."""
    import re as _re
    import struct

    base = encode_pdf([["v1 text"]], compress=False)
    old_xref = int(_re.search(rb"startxref\s+(\d+)", base).group(1))
    out = bytearray(base)
    new_stream = b"BT /F1 12 Tf 14 TL 72 760 Td (v2 hybrid) Tj ET"
    off2 = len(out)
    out += (
        b"2 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(new_stream), new_stream)
    )
    # xref stream object 6: entries for obj 2 (updated) and itself,
    # no filter, no predictor — the minimal spec shape
    xstm_at = len(out)
    rows = struct.pack(">BIH", 1, off2, 0) + struct.pack(
        ">BIH", 1, xstm_at, 0
    )
    out += (
        b"6 0 obj\n<< /Type /XRef /Size 7 /W [1 4 2] /Index [2 1 6 1] "
        b"/Length %d >>\nstream\n" % len(rows)
    ) + rows + b"\nendstream\nendobj\n"
    # classic update table: does NOT list obj 2; trailer points at the
    # xref stream via /XRefStm and at the original table via /Prev
    xref_at = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size 7 /Root 5 0 R /XRefStm %d /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (xstm_at, old_xref, xref_at)
    )
    assert pdf_extract_text(bytes(out)) == ["v2 hybrid"]


def test_xref_first_resolution_defeats_instream_shadowing():
    """ADVICE r7: byte sequences matching 'N G obj' inside stream
    bodies must not shadow real objects. With an intact xref chain the
    scan never runs, so text that literally contains '2 0 obj' (object
    2 IS the content stream here) extracts correctly."""
    tricky = "fake marker 2 0 obj endobj inside text"
    for xref_stream in (False, True):
        got = pdf_extract_text(
            encode_pdf([[tricky]], compress=False, xref_stream=xref_stream)
        )
        assert got == [tricky]


def test_flate_bomb_quarantines_not_oom():
    """A crafted Flate bomb must raise ValueError at the inflate
    ceiling (→ quarantine row under extract_pdf_text_df), never
    allocate the expansion (ADVICE r7)."""
    import vectra_py_spark.operators.pdf as P

    bomb = zlib.compress(b"\x00" * (64 << 20))
    payload = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(bomb)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + bomb
        + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n"
        b"3 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n"
        b"4 0 obj\n<< /Type /Page /Parent 3 0 R /Contents 1 0 R >>\n"
        b"endobj\ntrailer\n<< /Size 5 /Root 2 0 R >>\n%%EOF\n"
    )
    old = P.DECOMPRESS_CEILING
    P.DECOMPRESS_CEILING = 1 << 20
    try:
        with pytest.raises(ValueError, match="bomb"):
            pdf_extract_text(payload)
    finally:
        P.DECOMPRESS_CEILING = old
    # truncated Flate data is malformed, not a crash
    half = zlib.compress(b"BT (x) Tj ET")[:-4]
    trunc = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(half)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + half
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 2 /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(ValueError):
        pdf_extract_text(trunc)


def test_predictor_tiff_and_png_filters():
    """_apply_predictor: TIFF horizontal differencing and every PNG
    filter type reconstruct known vectors; bad shapes refuse."""
    from vectra_py_spark.operators.pdf import _apply_predictor

    # TIFF pred 2, 1 color, columns 4: rows of deltas accumulate
    enc = bytes([1, 1, 1, 1, 5, 0, 0, 0])
    assert _apply_predictor(enc, 2, 1, 8, 4) == bytes(
        [1, 2, 3, 4, 5, 5, 5, 5]
    )
    # PNG Sub (1): row [tag=1, 3, 2, 2] → [3, 5, 7]
    assert _apply_predictor(bytes([1, 3, 2, 2]), 10, 1, 8, 3) == bytes(
        [3, 5, 7]
    )
    # PNG Up (2) over two rows
    assert _apply_predictor(
        bytes([0, 1, 2, 3, 2, 10, 10, 10]), 12, 1, 8, 3
    ) == bytes([1, 2, 3, 11, 12, 13])
    # PNG Average (3): row [tag=3, 10] then [tag=3, 10] with up=10
    assert _apply_predictor(bytes([3, 10, 3, 10]), 12, 1, 8, 1) == bytes(
        [10, 15]
    )
    # PNG Paeth (4) first row behaves like Sub
    assert _apply_predictor(bytes([4, 7, 7]), 12, 1, 8, 2) == bytes(
        [7, 14]
    )
    with pytest.raises(ValueError, match="length mismatch"):
        _apply_predictor(bytes([2, 0]), 12, 1, 8, 2)
    with pytest.raises(ValueError, match="filter type"):
        _apply_predictor(bytes([9, 0, 0]), 12, 1, 8, 2)
    with pytest.raises(ValueError, match="8-bit"):
        _apply_predictor(b"\x00" * 8, 12, 1, 16, 2)


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Test-side TIFF/PDF LZW encoder (clear, 9→12-bit codes, EOD) —
    round-trips the reader's _lzw_decode."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    emit(256)  # clear
    w = b""
    for b in data:
        c = w + bytes([b])
        if c in table:
            w = c
            continue
        emit(table[w])
        table[c] = next_code
        next_code += 1
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(257)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_extra_stream_filters_round_trip():
    """The non-Flate filters real corpora carry: LZWDecode (with and
    without a predictor via DecodeParms), ASCIIHexDecode,
    ASCII85Decode, RunLengthDecode — each exercised through a full
    document round-trip by rewriting the writer's content stream."""
    import base64

    pages = [["filter test line one", "and line two"]]
    ref = pdf_extract_text(encode_pdf(pages))
    plain = encode_pdf(pages, compress=False)
    # the uncompressed writer emits '/Length N >>\nstream\n<ops>'
    import re as _re

    m = _re.search(rb"/Length (\d+) >>\nstream\n", plain)
    start = m.end()
    length = int(m.group(1))
    ops = plain[start : start + length]

    def rebuild(encoded: bytes, filt: bytes) -> bytes:
        return (
            plain[: m.start()]
            + filt
            + b" /Length " + str(len(encoded)).encode()
            + b" >>\nstream\n" + encoded
            + plain[start + length :]
        )

    cases = [
        (_lzw_encode(ops), b"/Filter /LZWDecode"),
        (base64.b16encode(ops) + b">", b"/Filter /ASCIIHexDecode"),
        (base64.a85encode(ops) + b"~>", b"/Filter /ASCII85Decode"),
    ]
    # RunLength: naive all-literal runs
    rl = bytearray()
    for i in range(0, len(ops), 127):
        chunk = ops[i : i + 127]
        rl += bytes([len(chunk) - 1]) + chunk
    rl.append(128)
    cases.append((bytes(rl), b"/Filter /RunLengthDecode"))
    # filter CHAIN: ASCIIHex over Flate
    fl = zlib.compress(ops)
    cases.append((
        base64.b16encode(fl) + b">",
        b"/Filter [/ASCIIHexDecode /FlateDecode]",
    ))
    for encoded, filt in cases:
        doc = rebuild(encoded, filt)
        assert pdf_extract_text(doc) == ref, filt
    # note: rebuild() splices AFTER the original stream bytes, so the
    # classic xref offsets shift and the chain-validation fallback scan
    # is what resolves objects here — also a real-corpus condition

    # LZW EarlyChange=0 via DecodeParms
    doc = rebuild(
        _lzw_encode(ops, early_change=0),
        b"/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>",
    )
    assert pdf_extract_text(doc) == ref

    # long input forces LZW code-width bumps both ways
    big = (b"the quick brown fox " * 400) + bytes(range(256)) * 8
    from vectra_py_spark.operators.pdf import _lzw_decode

    for ec in (0, 1):
        assert _lzw_decode(_lzw_encode(big, ec), 1 << 24, ec) == big
    # expansion caps hold for the byte-expanding filters
    with pytest.raises(ValueError, match="exceeds"):
        _lzw_decode(_lzw_encode(b"\x00" * 4096), 100)
    from vectra_py_spark.operators.pdf import _runlength_decode

    with pytest.raises(ValueError, match="exceeds"):
        _runlength_decode(b"\xff\x00" * 200, 100)


def _patch_font(doc: bytes, font_body: bytes, extra_obj: bytes = b"") -> bytes:
    """Swap the writer's Helvetica font dict for a custom one (and
    optionally append an extra object, e.g. a ToUnicode CMap stream —
    the chain-validation fallback scan picks it up)."""
    old = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    assert doc.count(old) == 1
    return doc.replace(old, font_body) + extra_obj


def test_font_encodings_decode_correctly():
    """Simple-font character decoding (round 8): /WinAnsiEncoding and
    /MacRomanEncoding route through the stdlib codecs, /Differences
    glyph names resolve via the AGL subset and uniXXXX, and an unknown
    glyph becomes a VISIBLE replacement — never silently wrong text."""
    base = encode_pdf([["ab\x93cd\x94"]], compress=False)
    # default (no /Encoding): latin-1 passthrough, \x93 stays \x93
    assert pdf_extract_text(base) == ["ab\x93cd\x94"]
    win = _patch_font(
        base,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>",
    )
    assert pdf_extract_text(win) == ["ab“cd”"]  # cp1252 quotes
    mac = _patch_font(
        encode_pdf([["x\x8ay"]], compress=False),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /MacRomanEncoding >>",
    )
    assert pdf_extract_text(mac) == ["xäy"]  # mac_roman 0x8A = ä

    diff = _patch_font(
        encode_pdf([["AB C"]], compress=False),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding /Differences "
        b"[65 /adieresis /emdash 67 /uni2020 68 /notaglyphname] >> >>",
    )
    assert pdf_extract_text(diff) == ["ä— †"]
    # unknown glyph name → visible replacement, not a wrong letter
    diff2 = _patch_font(
        encode_pdf([["AB"]], compress=False),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding << /Differences [65 /notaglyphname] >> >>",
    )
    assert pdf_extract_text(diff2) == ["�B"]


def test_tounicode_cmap_wins():
    """/ToUnicode bfchar + bfrange (both forms) override /Encoding per
    code; unmapped codes fall back to the encoding table. A second,
    CMap-less font selected mid-page via Tf reverts the decoder."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar <41> <00E4> <20> <0020> endbfchar\n"
        b"1 beginbfrange <42> <44> <0100> endbfrange\n"
        b"1 beginbfrange <45> <46> [<2460> <246000310032>] endbfrange\n"
        b"endcmap end end"
    )
    extra = (
        b"99 0 obj\n<< /Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n"
    )
    doc = _patch_font(
        encode_pdf([["ABCDEF gh"]], compress=False),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/ToUnicode 99 0 R >>",
        extra_obj=extra,
    )
    # A→ä, B..D→Ā Ā+1 Ā+2, E→①, F→multi-char "①12"-style target,
    # space via bfchar, g/h unmapped → latin-1 fallback
    assert pdf_extract_text(doc) == [
        "äĀāĂ①①\x31\x32 gh"
    ]
    # two fonts: F1 carries the CMap, F2 (no CMap) reverts to latin-1.
    # Build a page that switches fonts between two shows.
    body = b"BT /F1 12 Tf (A) Tj /F2 12 Tf (A) Tj ET"
    doc2 = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/ToUnicode 9 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\n"
        b"endobj\n"
        b"3 0 obj\n<< /Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Type /Page /Parent 5 0 R /Resources << /Font "
        b"<< /F1 1 0 R /F2 2 0 R >> >> /Contents 3 0 R >>\nendobj\n"
        b"5 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n"
        b"6 0 obj\n<< /Type /Catalog /Pages 5 0 R >>\nendobj\n"
        b"9 0 obj\n<< /Length 44 >>\nstream\n"
        b"1 beginbfchar <41> <00E4> endbfchar endcmap\nendstream\nendobj\n"
        b"trailer\n<< /Size 10 /Root 6 0 R >>\n%%EOF\n"
    )
    assert pdf_extract_text(doc2) == ["äA"]


def test_tj_kerning_space_heuristic():
    """TeX-style generators split words across TJ array elements with a
    large negative kerning adjustment standing in for the space —
    extraction must reinsert it (the classic 'foobar' failure)."""
    body = (
        b"BT /F1 12 Tf [(foo) -250 (bar)] TJ T* "
        b"[(kern) -50 (ing)] TJ T* [(wide) -1200 (gap)] TJ ET"
    )
    doc = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Page /Parent 3 0 R /Contents 1 0 R >>\n"
        b"endobj\n"
        b"3 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
        b"4 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n"
        b"trailer\n<< /Size 5 /Root 4 0 R >>\n%%EOF\n"
    )
    assert pdf_extract_text(doc) == [
        "foo bar\nkerning\nwide gap"
    ]


def test_pdf_info_document_metadata():
    """pdf_info surfaces /Info title/author/producer (PDFDocEncoding
    and UTF-16BE-with-BOM both), None when absent."""
    base = synth_pdf(1, 1)
    info = pdf_info(base)
    assert info["title"] is None and info["producer"] is None
    # attach /Info via a spec-correct incremental update: new object +
    # update xref section + trailer with /Prev
    import re as _re

    title16 = b"\xfe\xff" + "Tïtle".encode("utf-16-be")
    old_xref = int(_re.search(rb"startxref\s+(\d+)", base).group(1))
    doc = bytearray(base)
    info_at = len(doc)
    doc += (
        b"77 0 obj\n<< /Title (" + title16
        + b") /Producer (TestWriter 1.0) >>\nendobj\n"
    )
    xref_at = len(doc)
    doc += b"xref\n0 1\n0000000000 65535 f \n77 1\n%010d 00000 n \n" % info_at
    doc += (
        b"trailer\n<< /Size 78 /Root 5 0 R /Info 77 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (old_xref, xref_at)
    )
    got = pdf_info(bytes(doc))
    assert got["producer"] == "TestWriter 1.0"
    assert got["title"] == "Tïtle"
    assert got["n_pages"] == 1


def test_form_xobject_text_extracted():
    """Text inside Form XObjects (Do operator) must extract — real
    documents (letterheads, stamps, pdftk overlays) carry text there.
    The form's own /Resources resolve its fonts; a form without
    /Resources inherits the page's; self-referencing forms refuse at
    the depth limit instead of looping."""
    form_body = b"BT /F9 10 Tf (from the form) Tj ET"
    page_body = b"BT /F1 12 Tf (page text) Tj ET /X1 Do"
    doc = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding << /Differences [102 /emdash] >> >>\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(page_body)).encode()
        + b" >>\nstream\n" + page_body + b"\nendstream\nendobj\n"
        b"3 0 obj\n<< /Type /XObject /Subtype /Form /Resources "
        b"<< /Font << /F9 1 0 R >> >> /Length "
        + str(len(form_body)).encode()
        + b" >>\nstream\n" + form_body + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Type /Page /Parent 5 0 R /Resources << /Font "
        b"<< /F1 6 0 R >> /XObject << /X1 3 0 R >> >> /Contents 2 0 R "
        b">>\nendobj\n"
        b"5 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n"
        b"6 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b">>\nendobj\n"
        b"trailer\n<< /Size 7 /Root 7 0 R >>\n"
        b"7 0 obj\n<< /Type /Catalog /Pages 5 0 R >>\nendobj\n"
        b"trailer\n<< /Size 8 /Root 7 0 R >>\n%%EOF\n"
    )
    # form font F9 maps 'f' (102) -> emdash via Differences, proving
    # the FORM's resources (not the page's) decode its text
    assert pdf_extract_text(doc) == ["page text\n—rom the —orm"]

    # self-referencing form → ValueError at the depth limit, no hang
    loop_body = b"/X1 Do"
    loop = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /XObject /Subtype /Form /Length "
        + str(len(loop_body)).encode()
        + b" >>\nstream\n" + loop_body + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Page /Parent 3 0 R /Resources "
        b"<< /XObject << /X1 1 0 R >> >> /Contents 1 0 R >>\nendobj\n"
        b"3 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
        b"4 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n"
        b"trailer\n<< /Size 5 /Root 4 0 R >>\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="nesting"):
        pdf_extract_text(loop)


def test_read_pdf_documents_source(spark):
    """Folder-of-PDFs → (uri, text, doc_type) rows, corrupt files
    skipped quietly — the drop-of-PDFs ingestion shape, symmetric with
    warc_documents; flows into upsert_documents_df."""
    from vectra_py_spark.operators.pdf import read_pdf_documents

    d = tempfile.mkdtemp()
    with open(os.path.join(d, "a.pdf"), "wb") as f:
        f.write(encode_pdf([["doc a line"]]))
    with open(os.path.join(d, "b.pdf"), "wb") as f:
        f.write(encode_pdf([["doc b page 1"], ["doc b page 2"]],
                           xref_stream=True, objstm=True))
    with open(os.path.join(d, "junk.pdf"), "wb") as f:
        f.write(b"%PDF-1.4 not really")
    got = {os.path.basename(r.uri): r for r in
           read_pdf_documents(spark, d).collect()}
    assert set(got) == {"a.pdf", "b.pdf"}
    assert got["a.pdf"].text == "doc a line"
    assert got["b.pdf"].text == "doc b page 1\n\ndoc b page 2"
    assert got["b.pdf"].doc_type == "pdf"


def test_declared_gates_refuse_loudly():
    p = synth_pdf(1, 1)
    # encryption is now SUPPORTED (test_pdf_crypto.py) — but a broken
    # /Encrypt pointing at a missing object still refuses cleanly
    enc = p.replace(b"/Root", b"/Encrypt 9 0 R /Root", 1)
    with pytest.raises(ValueError, match="object 9 not found"):
        pdf_extract_text(enc)
    # composite font without Identity-H + /ToUnicode (full Type0
    # support is in test_type0_identity_h_roundtrip)
    t0 = p.replace(b"/Subtype /Type1", b"/Subtype /Type0", 1)
    with pytest.raises(ValueError, match="Type0"):
        pdf_extract_text(t0)
    # exotic filter (image codecs stay out of scope)
    dct = p.replace(b"/Filter /FlateDecode", b"/Filter /DCTDecode", 1)
    with pytest.raises(ValueError, match="DCTDecode"):
        pdf_extract_text(dct)
    # xref stream marker
    xs = (
        b"%PDF-1.5\n1 0 obj\n<< /Type /XRef /Length 0 >>\nstream\n"
        b"\nendstream\nendobj\nstartxref\n9\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="xref|XRef|trailer"):
        pdf_extract_text(xs)


def test_malformed_contract_and_fuzz():
    p = synth_pdf(2, 2)
    with pytest.raises(ValueError):
        pdf_extract_text(b"")
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_extract_text(b"PK\x03\x04zipfile")
    for cut in (8, 40, len(p) // 3, len(p) // 2):
        with pytest.raises(ValueError):
            pdf_extract_text(p[:cut])
    # losing only the startxref/%%EOF tail still extracts — the parser
    # scans objects and finds the trailer dict itself, deliberate
    # leniency for tail-truncated crawl PDFs
    assert len(pdf_extract_text(p[: len(p) - 10])) == 2
    # corrupt the Flate stream
    bad = bytearray(p)
    i = bytes(bad).index(b"stream\n") + 7
    bad[i : i + 6] = b"\xff\xfe\xfd\xfc\xfb\xfa"
    with pytest.raises(ValueError):
        pdf_extract_text(bytes(bad))
    # seeded mutations: ValueError only
    import sys

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    rng = np.random.default_rng(424242)
    for mut in _mutations(p, rng, 250):
        try:
            pdf_extract_text(mut)
        except ValueError:
            pass
    # regression seeds from the round-7 extended fuzz pass: mutations
    # that once escaped as AttributeError ('tuple'.get on a stream
    # where a dict was expected) and TypeError ('in' on an int trailer)
    small = synth_pdf(1, 1)
    for seed in (10, 28, 49):
        rng = np.random.default_rng(seed * 7919 + 13)
        for mut in _mutations(small, rng, 25):
            for f in (pdf_extract_text, pdf_info):
                try:
                    f(mut)
                except ValueError:
                    pass
    # the round-8 xref-stream/objstm paths obey the same contract —
    # mutations hit the W-field unpacking, the PNG predictor, the
    # ObjStm header walk, and the chain-validation fallback
    for flavor_seed, kw in (
        (881, dict(xref_stream=True)),
        (882, dict(xref_stream=True, objstm=True)),
    ):
        flav = encode_pdf([["fuzz target", "two lines"]], **kw)
        rng = np.random.default_rng(flavor_seed)
        for mut in _mutations(flav, rng, 250):
            for f in (pdf_extract_text, pdf_info):
                try:
                    f(mut)
                except ValueError:
                    pass


def test_spark_operator_and_probe(spark):
    good = synth_pdf(3, 2)
    rows = [
        ("ok", "doc", bytearray(good), {}),
        ("bad", "doc", bytearray(good[: len(good) // 3]), {}),
        ("null", "doc", None, {}),
    ]
    from vectra_py_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = extract_pdf_text_df(df, on_error="quarantine").collect()
    ok = sorted(
        [r for r in got if r.media_id == "ok"], key=lambda r: r.page
    )
    assert [r.page for r in ok] == [0, 1, 2]
    assert ok[1].text == "Page 1 line 0 lorem ipsum\nPage 1 line 1 lorem ipsum"
    errs = {r.media_id for r in got if r.error}
    assert errs == {"bad", "null"}
    with pytest.raises(Exception):
        extract_pdf_text_df(df, on_error="fail").collect()
    # probe triage knows PDFs
    assert probe_payload(good) == {"kind": "pdf", "n_frames": 3}


def test_warc_pdf_glue(spark):
    """application/pdf WARC records land as doc_type='pdf' documents;
    corrupt PDFs skip quietly (the glue is best-effort)."""
    from vectra_py_spark.sources.warc import (
        read_warc,
        synth_warc,
        warc_documents,
    )

    d = tempfile.mkdtemp()
    good = synth_pdf(2, 1)
    pages = [
        ("http://ex.org/paper.pdf", good, "application/pdf"),
        ("http://ex.org/broken.pdf", good[:50], "application/pdf"),
        ("http://ex.org/t.txt", b"plain", "text/plain"),
    ]
    with open(os.path.join(d, "s.warc"), "wb") as f:
        f.write(synth_warc(pages))
    docs = {r.uri: r for r in warc_documents(read_warc(spark, d)).collect()}
    assert set(docs) == {"http://ex.org/paper.pdf", "http://ex.org/t.txt"}
    assert docs["http://ex.org/paper.pdf"].doc_type == "pdf"
    assert "Page 0 line 0" in docs["http://ex.org/paper.pdf"].text
    assert "Page 1 line 0" in docs["http://ex.org/paper.pdf"].text


def test_type0_identity_h_roundtrip():
    """Composite Type0/Identity-H fonts — 2-byte CIDs decoded through
    the /ToUnicode CMap — across every xref/compression flavor, with
    non-latin and astral-plane text (the content type1 cannot carry).
    CIDs are dense 1-based indexes, NOT code points, so a passing
    round-trip proves the CMap path and not an identity shortcut."""
    from vectra_py_spark.operators.pdf import _parse_tounicode

    pages = [
        ["Hello CID world", "second line"],
        ["日本語テキスト", "mixed ascii 字"],
        ["astral 𝕏 plane", ""],
    ]
    want = [
        "Hello CID world\nsecond line",
        "日本語テキスト\nmixed ascii 字",
        "astral 𝕏 plane",
    ]
    for xref_stream in (False, True):
        for objstm in ((False, True) if xref_stream else (False,)):
            for compress in (False, True):
                b = encode_pdf(
                    pages, compress=compress, xref_stream=xref_stream,
                    objstm=objstm, font="type0",
                )
                assert pdf_extract_text(b) == want
                assert pdf_info(b)["n_pages"] == 3
    raw = encode_pdf(pages, compress=False, font="type0")
    assert b"(Hello" not in raw  # really CID hex strings, not latin-1
    assert b"/Identity-H" in raw and b"/CIDFontType2" in raw
    # multi-byte bfrange forms: base-increment and array, 2-byte codes
    cmap = _parse_tounicode(
        b"2 beginbfrange\n"
        b"<0101> <0103> <0041>\n"
        b"<0201> <0202> [<00580059> <005A>]\n"
        b"endbfrange"
    )
    assert cmap[b"\x01\x01"] == "A" and cmap[b"\x01\x03"] == "C"
    assert cmap[b"\x02\x01"] == "XY" and cmap[b"\x02\x02"] == "Z"


def test_type0_gates_refuse_what_they_must():
    """Type0 WITHOUT /ToUnicode (CIDs = glyph indexes) and predefined
    CMap /Encoding names refuse by name — same-length byte surgery so
    xref offsets stay valid. An unknown CID decodes as visible U+FFFD,
    never silently wrong text; an odd trailing byte likewise."""
    raw = encode_pdf([["abc xyz"]], compress=False, font="type0")
    no_tu = raw.replace(b"/ToUnicode", b"/TuUnicode")
    with pytest.raises(ValueError, match="ToUnicode"):
        pdf_extract_text(no_tu)
    pre = raw.replace(b"/Encoding /Identity-H", b"/Encoding /UniJIS-Qaa")
    assert len(pre) == len(raw)
    with pytest.raises(ValueError, match="unsupported /Encoding"):
        pdf_extract_text(pre)
    # CID past the CMap → U+FFFD ("abc xyz" has 6 distinct chars → CIDs
    # 1..6; 00FF is unmapped); odd tail byte → trailing U+FFFD
    hexed = raw.replace(b"<000200030004", b"<00FF00030004", 1)
    assert len(hexed) == len(raw)
    got = pdf_extract_text(hexed)
    assert got[0].startswith("�") and got[0].endswith("xyz")
