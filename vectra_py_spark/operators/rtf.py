"""RTF text extraction — pure stdlib, from the published Rich Text
Format specification (Microsoft RTF 1.9.1, itself public): the
remaining pre-OOXML office format crawls actually contain after
.doc/.ppt (OLE, gated by name in operators/office.py).

The reader is a real group-stack tokenizer, not a regex strip:
control words with signed numeric parameters, the three escaped
delimiters (\\\\ \\{ \\}), hex byte escapes (\\'hh) decoded through the
document's declared code page (\\ansicpg / \\windows-1252 default),
Unicode escapes (\\uN with negative-wraparound per spec) honoring the
current \\ucN fallback-skip count per group, paragraph/line/tab/cell
controls mapped to text structure, and skip-destinations (font/color/
stylesheet tables, info, headers/footers, pict/object payloads, and
every unrecognized \\* starred destination) dropped whole — the parts
that turn into mojibake or binary garbage under naive stripping.

Contract: malformed payloads raise :class:`ValueError` only
(fuzz-pinned). Scale shape: per-payload parse in the worker, linear
in payload bytes; reached through ``office_extract_text`` dispatch,
the WARC glue (application/rtf, text/rtf) and
``read_office_documents``.
"""

from __future__ import annotations

import codecs
import re

__all__ = ["rtf_extract_text", "encode_rtf"]

# Destinations whose content is data, not document text (spec §"
# Destination Text"). Headers/footers are text but duplicated page
# furniture — a corpus wants body text, same policy as the PDF/HTML
# extractors.
_SKIP_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
    b"object", b"header", b"footer", b"headerl", b"headerr",
    b"headerf", b"footerl", b"footerr", b"footerf", b"xe", b"tc",
    b"txe", b"fldinst",  # field INSTRUCTIONS skip; \fldrslt text stays
    b"themedata", b"colorschememapping", b"datastore", b"latentstyles",
    b"listtable", b"listoverridetable", b"revtbl", b"rsidtbl",
    b"generator", b"ftnsep", b"ftnsepc", b"aftnsep", b"aftnsepc",
}

# Control SYMBOLS / words that emit fixed text
_EMITS = {
    b"par": "\n", b"line": "\n", b"tab": "\t", b"cell": "\t",
    b"row": "\n", b"sect": "\n", b"page": "\n", b"emdash": "—",
    b"endash": "–", b"lquote": "‘", b"rquote": "’", b"ldblquote": "“",
    b"rdblquote": "”", b"bullet": "•", b"emspace": " ",
    b"enspace": " ", b"qmspace": " ", b"~": " ", b"-": "",
    b"_": "-",
}

# Control words are ASCII LETTER sequences — BOTH cases are legal
# (\XeTeX-style custom words); lowercase-only parsing leaked word
# residue into extracted text (review).
_CW_RE = re.compile(rb"([A-Za-z]+)(-?\d+)? ?", re.S)


def _codec_for(cpg: int) -> str:
    try:
        return codecs.lookup(f"cp{cpg}").name
    except LookupError:
        return "cp1252"


def rtf_extract_text(payload: bytes) -> str:
    r"""RTF bytes → plain text (\par/\line → newline, \tab/\cell →
    tab). ValueError on anything that is not a well-formed-enough RTF
    group structure."""
    if payload[:5] != b"{\\rtf":
        raise ValueError(f"not an RTF payload: {payload[:8]!r}")
    d = payload
    n = len(d)
    pos = 0
    out: list[str] = []
    codec = "cp1252"
    # group state: (uc_count, skipping)
    stack: list[tuple[int, bool]] = []
    uc, skipping = 1, False
    pending_skip = 0  # chars to drop after \uN (the \ucN fallback)
    byte_run = bytearray()  # accumulated \'hh / raw bytes, one decode
    pending_high = [None]   # a \uN high surrogate awaiting its low

    def settle_high() -> None:
        # a high surrogate not followed by its low half is a lone
        # half-pair: visible unknown, emitted in document order
        if pending_high[0] is not None:
            pending_high[0] = None
            if not skipping:
                out.append("�")

    def flush() -> None:
        settle_high()
        if byte_run:
            out.append(byte_run.decode(codec, "replace"))
            byte_run.clear()

    def emit(s: str) -> None:
        # control-word text (\par, \u…) — NOT subject to the \ucN
        # fallback skip, which consumes literal characters only
        if s and not skipping:
            flush()
            out.append(s)

    depth = 0
    while pos < n:
        c = d[pos]
        if c == 0x7B:  # {
            flush()
            stack.append((uc, skipping))
            depth += 1
            if depth > 256:
                raise ValueError("RTF groups nested too deep")
            pos += 1
        elif c == 0x7D:  # }
            flush()
            if not stack:
                break  # document group closed; trailing bytes ignored
            uc, skipping = stack.pop()
            depth -= 1
            pos += 1
        elif c == 0x5C:  # backslash
            if pos + 1 >= n:
                raise ValueError("RTF ends inside a control sequence")
            nxt = d[pos + 1]
            if nxt == 0x27:  # \'hh — hex-escaped byte in the code page
                h = d[pos + 2 : pos + 4]
                if len(h) < 2:
                    raise ValueError("RTF \\' escape truncated")
                try:
                    b = int(h, 16)
                except ValueError as exc:
                    raise ValueError(
                        f"bad RTF hex escape {h!r}"
                    ) from exc
                if pending_skip and not skipping:
                    pending_skip -= 1
                elif not skipping:
                    byte_run.append(b)
                pos += 4
            elif nxt in (0x5C, 0x7B, 0x7D):  # escaped delimiter
                if pending_skip and not skipping:
                    pending_skip -= 1
                else:
                    emit(chr(nxt))
                pos += 2
            elif nxt == 0x2A:  # \* — starred destination: data, not
                # document text; the whole group skips per spec
                skipping = True
                pos += 2
            elif not (0x61 <= nxt <= 0x7A
                      or 0x41 <= nxt <= 0x5A):  # control SYMBOL
                sym = d[pos + 1 : pos + 2]
                emit(_EMITS.get(sym, ""))
                pos += 2
            else:  # control word
                m = _CW_RE.match(d, pos + 1)
                if not m:
                    raise ValueError(
                        f"unparseable RTF control at byte {pos}"
                    )
                word, num = m.group(1), m.group(2)
                pos = m.end()
                if word in _SKIP_DESTS or word == b"fldinst":
                    skipping = True
                elif word == b"uc":
                    # clamp: a negative \ucN would make the skip
                    # counter negative-truthy and silently eat ALL
                    # following text (review)
                    uc = max(0, int(num or 1))
                elif word == b"ansicpg" and num:
                    flush()
                    codec = _codec_for(int(num))
                elif word == b"u" and num is not None:
                    cp = int(num)
                    if cp < 0:
                        cp += 65536
                    if 0xD800 <= cp <= 0xDBFF:
                        # high surrogate: real RTF writes astral chars
                        # as \uHIGH\uLOW pairs (hypothesis-found)
                        settle_high()
                        pending_high[0] = cp
                    elif (0xDC00 <= cp <= 0xDFFF
                          and pending_high[0] is not None):
                        hi = pending_high[0]
                        pending_high[0] = None
                        emit(chr(
                            0x10000 + ((hi - 0xD800) << 10)
                            + (cp - 0xDC00)
                        ))
                    elif 0 <= cp <= 0xFFFF and not (
                        0xD800 <= cp <= 0xDFFF
                    ):
                        emit(chr(cp))
                    else:
                        emit("�")
                    pending_skip += 0 if skipping else uc
                elif word == b"bin" and num:
                    # raw binary run: skip exactly N bytes, no escapes
                    blen = max(0, int(num))
                    if pos + blen > n:
                        raise ValueError("RTF \\bin run truncated")
                    pos += blen
                else:
                    emit(_EMITS.get(word, ""))
        else:
            if c not in (0x0A, 0x0D, 0x00):  # bare newlines are ignored
                if pending_skip and not skipping:
                    pending_skip -= 1
                elif not skipping:
                    byte_run.append(c)
            pos += 1
    flush()
    if stack:
        # unbalanced but salvage what decoded — tail-truncated crawl
        # payloads are the norm; an EMPTY result from garbage refuses
        if not any(s.strip() for s in out):
            raise ValueError("RTF unbalanced with no recoverable text")
    return "".join(out)


def encode_rtf(paragraphs: list[str], codepage: int = 1252) -> bytes:
    r"""Paragraph strings → a valid RTF document. ASCII passes
    through; characters representable in ``codepage`` emit as \'hh
    hex escapes and the rest as \uN with a '?' fallback — so a
    round-trip exercises all three text paths the reader has."""
    codec = _codec_for(codepage)
    body: list[str] = []
    for i, para in enumerate(paragraphs):
        if i:
            body.append("\\par ")
        for ch in para:
            if ch == "\t":
                body.append("\\tab ")
            elif ch == "\n":
                body.append("\\line ")
            elif ch in "\\{}":
                body.append("\\" + ch)
            elif ord(ch) < 128:
                body.append(ch)
            else:
                try:
                    b = ch.encode(codec)
                    body.append("".join(f"\\'{x:02x}" for x in b))
                except UnicodeEncodeError:
                    # astral chars go as surrogate \uHIGH\uLOW pairs,
                    # each unit signed-16 per spec
                    units = ch.encode("utf-16-be")
                    for k in range(0, len(units), 2):
                        u = int.from_bytes(units[k : k + 2], "big")
                        if u > 32767:
                            u -= 65536
                        body.append(f"\\u{u}?")
    return (
        "{\\rtf1\\ansi\\ansicpg%d\\deff0"
        "{\\fonttbl{\\f0\\fswiss Helvetica;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        "{\\info{\\title synth}}"
        "\\uc1\\f0\\fs24 %s}" % (codepage, "".join(body))
    ).encode("ascii")
