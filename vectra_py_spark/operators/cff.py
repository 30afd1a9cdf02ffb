"""Minimal CFF (Compact Font Format, Adobe TN #5176 — public spec)
charset reader + fixture writer: the /FontFile3 counterpart of
``operators/truetype.py`` for PDF Type0 fonts without /ToUnicode.

A bare CFF program has no sfnt ``cmap``; its bridge back to text is
the CHARSET table (glyph index → SID) plus the string heap (SID →
glyph NAME like ``adieresis`` or ``uni4E2D``), which the existing AGL
machinery turns into characters. Honest scope:

- **Name-keyed CFF** (the Type1C shape): charset formats 0/1/2 and
  the predefined ISOAdobe charset (offset 0, SID == GID). SIDs 1–95
  resolve through the spec's standard-strings list — that block is the
  printable-ASCII names in code-point order BY CONSTRUCTION, the one
  region of Appendix A that cannot be misremembered; SIDs ≥ 391
  resolve through the font's own String INDEX (the common subset
  shape: ``uniXXXX``/AGL names). SIDs 96–390 (Latin-1 supplement +
  Expert names) are deliberately NOT table-driven here — a misordered
  entry would be silently wrong text, so those glyphs map to missing
  instead. Subsetters that reference them emit /ToUnicode anyway.
- **CID-keyed CFF** (Top DICT carries /ROS): the charset maps glyphs
  to CIDs, not names — there is nothing to invert without the
  registry's published data files; refuses by name (same boundary as
  predefined CMaps).

Malformed payloads raise :class:`ValueError` (fuzz-campaign target).
"""

from __future__ import annotations

import struct

__all__ = ["cff_gid_to_name", "cff_gid_to_unicode", "encode_cff_charset"]

_MAX_GLYPHS = 1 << 16
_MAX_INDEX_ITEMS = 1 << 16
_MAX_INDEX_BYTES = 1 << 24

# SIDs 1..95: printable ASCII glyph names in code-point order (TN#5176
# Appendix A — this prefix is ordered by construction).
_ASCII_NAMES = (
    "space exclam quotedbl numbersign dollar percent ampersand "
    "quoteright parenleft parenright asterisk plus comma hyphen period "
    "slash zero one two three four five six seven eight nine colon "
    "semicolon less equal greater question at A B C D E F G H I J K L "
    "M N O P Q R S T U V W X Y Z bracketleft backslash bracketright "
    "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p "
    "q r s t u v w x y z braceleft bar braceright asciitilde"
).split()
assert len(_ASCII_NAMES) == 95


def _u8(d: bytes, p: int) -> int:
    # negative p would wrap (Python indexing) or blow struct — a
    # mutated DICT integer operand can be any int32 (fuzz-found)
    if not 0 <= p < len(d):
        raise ValueError("CFF read out of range (u8)")
    return d[p]


def _u16(d: bytes, p: int) -> int:
    if not 0 <= p or p + 2 > len(d):
        raise ValueError("CFF read out of range (u16)")
    return struct.unpack_from(">H", d, p)[0]


def _read_index(d: bytes, p: int) -> tuple[list[bytes], int]:
    count = _u16(d, p)
    p += 2
    if count == 0:
        return [], p
    if count > _MAX_INDEX_ITEMS:
        raise ValueError("CFF INDEX count bomb")
    off_size = _u8(d, p)
    p += 1
    if not 1 <= off_size <= 4:
        raise ValueError(f"CFF INDEX offSize {off_size} invalid")
    offs = []
    for i in range(count + 1):
        q = p + i * off_size
        if q + off_size > len(d):
            raise ValueError("CFF INDEX offsets truncated")
        offs.append(int.from_bytes(d[q : q + off_size], "big"))
    data_at = p + (count + 1) * off_size - 1  # offsets are 1-based
    if offs[0] != 1:
        raise ValueError("CFF INDEX first offset must be 1")
    if offs[-1] > _MAX_INDEX_BYTES:
        raise ValueError("CFF INDEX data bomb")
    items = []
    for i in range(count):
        a, b = offs[i], offs[i + 1]
        if a > b or data_at + b > len(d):
            raise ValueError("CFF INDEX offsets out of order/range")
        items.append(d[data_at + a : data_at + b])
    return items, data_at + offs[-1]


def _parse_dict(d: bytes) -> dict[tuple, list]:
    """CFF DICT bytes → {operator: operands}. Reals are parsed and
    discarded (None operand) — nothing here needs them."""
    out: dict[tuple, list] = {}
    operands: list = []
    p = 0
    while p < len(d):
        b0 = d[p]
        if 32 <= b0 <= 246:
            operands.append(b0 - 139)
            p += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + _u8(d, p + 1) + 108)
            p += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - _u8(d, p + 1) - 108)
            p += 2
        elif b0 == 28:
            operands.append(
                struct.unpack_from(">h", d, p + 1)[0]
                if p + 3 <= len(d)
                else _bad()
            )
            p += 3
        elif b0 == 29:
            if p + 5 > len(d):
                raise ValueError("CFF DICT int32 truncated")
            operands.append(struct.unpack_from(">i", d, p + 1)[0])
            p += 5
        elif b0 == 30:  # real: BCD nibbles until 0xF
            p += 1
            while p < len(d):
                nib = d[p]
                p += 1
                if nib & 0x0F == 0x0F or nib >> 4 == 0x0F:
                    break
            operands.append(None)
        elif b0 == 12:
            if p + 2 > len(d):
                raise ValueError("CFF DICT escape operator truncated")
            out[(12, d[p + 1])] = operands
            operands = []
            p += 2
        elif b0 <= 21:
            out[(b0,)] = operands
            operands = []
            p += 1
        else:
            raise ValueError(f"CFF DICT byte {b0:#x} invalid")
    return out


def _bad():
    raise ValueError("CFF DICT int16 truncated")


def cff_gid_to_name(cff: bytes) -> dict[int, str]:
    """Bare CFF bytes → {glyph index: glyph name} via the charset.
    Unresolvable SIDs (the 96–390 block) are omitted, never guessed."""
    if len(cff) < 4 or cff[0] != 1:
        raise ValueError("not a CFF (major version != 1)")
    hdr_size = cff[2]
    if hdr_size < 4:
        raise ValueError("CFF hdrSize < 4")
    p = hdr_size
    _names, p = _read_index(cff, p)
    top_dicts, p = _read_index(cff, p)
    strings, p = _read_index(cff, p)
    if not top_dicts:
        raise ValueError("CFF has no Top DICT")
    top = _parse_dict(top_dicts[0])
    if (12, 30) in top:
        raise ValueError(
            "CID-keyed CFF (/ROS) — charset carries CIDs, not glyph "
            "names; unrecoverable without the registry's published "
            "mapping files; unsupported"
        )
    cs_ops = top.get((17,))
    if not cs_ops or not isinstance(cs_ops[-1], int):
        raise ValueError("CFF Top DICT has no CharStrings offset")
    charstrings, _ = _read_index(cff, cs_ops[-1])
    n_glyphs = len(charstrings)
    if not n_glyphs or n_glyphs > _MAX_GLYPHS:
        raise ValueError("CFF glyph count invalid")

    charset_ops = top.get((15,), [0])
    charset_off = charset_ops[-1] if charset_ops else 0
    if not isinstance(charset_off, int):
        raise ValueError("CFF charset offset is not an integer")
    sids: list[int] = [0]  # gid 0 = .notdef
    if charset_off == 0:  # predefined ISOAdobe: SID == GID
        sids.extend(range(1, n_glyphs))
    elif charset_off in (1, 2):
        raise ValueError(
            "CFF predefined Expert charsets — unsupported"
        )
    else:
        fmt = _u8(cff, charset_off)
        q = charset_off + 1
        if fmt == 0:
            for _ in range(n_glyphs - 1):
                sids.append(_u16(cff, q))
                q += 2
        elif fmt in (1, 2):
            while len(sids) < n_glyphs:
                first = _u16(cff, q)
                q += 2
                if fmt == 1:
                    n_left = _u8(cff, q)
                    q += 1
                else:
                    n_left = _u16(cff, q)
                    q += 2
                for k in range(n_left + 1):
                    if len(sids) >= n_glyphs:
                        break
                    sids.append(first + k)
        else:
            raise ValueError(f"CFF charset format {fmt} unsupported")

    out: dict[int, str] = {}
    for gid, sid in enumerate(sids):
        if gid == 0:
            continue
        if 1 <= sid <= 95:
            out[gid] = _ASCII_NAMES[sid - 1]
        elif sid >= 391:
            i = sid - 391
            if i >= len(strings):
                raise ValueError("CFF SID past the String INDEX")
            out[gid] = strings[i].decode("latin-1")
        # 0 (.notdef) and 96–390: no safe mapping — omit
    return out


def cff_gid_to_unicode(cff: bytes) -> dict[int, str]:
    """Bare CFF bytes → {glyph index: character} through the glyph
    names (AGL subset + uniXXXX/uXXXXXX forms — the same resolver the
    simple-font /Differences path uses)."""
    from vectra_py_spark.operators.pdf import _glyph_to_char

    out: dict[int, str] = {}
    for gid, name in cff_gid_to_name(cff).items():
        ch = _glyph_to_char(b"/" + name.encode("latin-1", "replace"))
        if ch != "�":
            out[gid] = ch
    if not out:
        raise ValueError(
            "CFF charset yields no AGL/uniXXXX-resolvable glyph names"
        )
    return out


# ---------------------------------------------------------------------------
# Writer (fixtures): a minimal name-keyed CFF — header, Name/Top DICT/
# String/Global Subr INDEXes, format-0 charset, stub CharStrings.
# ---------------------------------------------------------------------------
def _mk_index(items: list[bytes]) -> bytes:
    if not items:
        return struct.pack(">H", 0)
    data = b"".join(items)
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    return (
        struct.pack(">HB", len(items), 4)
        + b"".join(struct.pack(">I", o) for o in offs)
        + data
    )


def encode_cff_charset(glyph_names: list[str]) -> bytes:
    """Glyph names (for GIDs 1..n; GID 0 is .notdef) → a minimal valid
    name-keyed CFF whose charset/string heap round-trips them. Names
    in the ASCII standard block use their standard SID; everything
    else goes to the String INDEX (SID 391+)."""
    if not glyph_names:
        raise ValueError("encode_cff_charset needs at least one glyph")
    std_sid = {n: i + 1 for i, n in enumerate(_ASCII_NAMES)}
    custom: list[bytes] = []
    sids: list[int] = []
    for name in glyph_names:
        if name in std_sid:
            sids.append(std_sid[name])
        else:
            sids.append(391 + len(custom))
            custom.append(name.encode("latin-1"))

    header = bytes([1, 0, 4, 4])
    name_index = _mk_index([b"SynthCFF"])
    string_index = _mk_index(custom)
    gsubr_index = _mk_index([])
    charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    charstrings = _mk_index([b"\x0e"] * (len(glyph_names) + 1))

    def top_dict(charset_off: int, cs_off: int) -> bytes:
        # fixed-width int32 operands keep the layout single-pass-able
        return (
            b"\x1d" + struct.pack(">i", charset_off) + b"\x0f"
            + b"\x1d" + struct.pack(">i", cs_off) + b"\x11"
        )

    td_len = len(top_dict(0, 0))
    top_index_overhead = 2 + 1 + 2 * 4  # count, offSize, two offsets
    pos_after_top = (
        len(header) + len(name_index) + top_index_overhead + td_len
    )
    charset_off = pos_after_top + len(string_index) + len(gsubr_index)
    cs_off = charset_off + len(charset)
    top_index = _mk_index([top_dict(charset_off, cs_off)])
    assert len(top_index) == top_index_overhead + td_len
    return (
        header + name_index + top_index + string_index + gsubr_index
        + charset + charstrings
    )
