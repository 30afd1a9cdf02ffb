"""Legacy PowerPoint binary (.ppt) text extraction — pure stdlib,
from the public [MS-PPT] specification over the [MS-CFB] container
(:mod:`.cfb`).

The PowerPoint Document stream is a tree of 8-byte-headed records
(recVer/recInstance, recType, recLen); containers (recVer 0xF) nest,
atoms carry data. Text lives in TextCharsAtom (UTF-16LE) and
TextBytesAtom (cp1252) atoms in document order — the reader walks the
real record tree (bounded recursion, length-validated) and collects
them, which is slide order for the files generators write. Encrypted
decks (CryptSession10Container present) refuse by name.

Contract: ValueError only (fuzz-pinned). Reached through
``office_extract_text`` dispatch, the WARC glue
(application/vnd.ms-powerpoint) and ``read_office_documents``.
"""

from __future__ import annotations

import struct

from vectra_py_spark.operators.cfb import CfbReader, encode_cfb

__all__ = ["ppt_extract_text", "encode_ppt"]

_TEXT_CHARS_ATOM = 0x0FA0   # UTF-16LE
_TEXT_BYTES_ATOM = 0x0FA8   # cp1252
_CRYPT_SESSION = 0x2F14     # CryptSession10Container → encrypted
_SLIDE_CONTAINER = 0x03EE
_DOCUMENT_CONTAINER = 0x03E8


def _walk(data: bytes, pos: int, end: int, out: list[str],
          depth: int = 0) -> None:
    if depth > 64:
        raise ValueError(".ppt record tree too deep")
    while pos + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, pos)
        body = pos + 8
        if rlen > end - body:
            raise ValueError(
                f".ppt record 0x{rtype:04X} runs past its parent"
            )
        if rtype == _CRYPT_SESSION:
            raise ValueError("encrypted .ppt — unsupported by design")
        if ver_inst & 0x0F == 0x0F:  # container
            _walk(data, body, body + rlen, out, depth + 1)
        elif rtype == _TEXT_CHARS_ATOM:
            out.append(
                data[body : body + rlen].decode("utf-16-le", "replace")
            )
        elif rtype == _TEXT_BYTES_ATOM:
            out.append(
                data[body : body + rlen].decode("cp1252", "replace")
            )
        pos = body + rlen


def ppt_extract_text(payload: bytes) -> str:
    """Legacy .ppt bytes → text, one line per text atom in document
    order (\\r run separators inside atoms become newlines)."""
    try:
        return _ppt_extract(payload)
    except struct.error as exc:
        raise ValueError(f"malformed .ppt record: {exc}") from exc


def _ppt_extract(payload: bytes) -> str:
    cfb = CfbReader(payload)
    if not cfb.has("PowerPoint Document"):
        raise ValueError(
            "OLE payload has no PowerPoint Document stream — not a .ppt"
        )
    data = cfb.stream("PowerPoint Document")
    out: list[str] = []
    _walk(data, 0, len(data), out)
    return "\n".join(
        t.replace("\r", "\n").rstrip("\x00") for t in out
    )


def encode_ppt(slides: list[list[str]]) -> bytes:
    """Per-slide paragraph lists → a minimal record-valid .ppt:
    one SlideContainer per slide under a DocumentContainer, paragraphs
    as TextCharsAtom when they need UTF-16 else TextBytesAtom — so a
    round-trip exercises both atom decoders and the container
    recursion."""
    def record(ver_inst: int, rtype: int, body: bytes) -> bytes:
        return struct.pack("<HHI", ver_inst, rtype, len(body)) + body

    slide_recs = []
    for paras in slides:
        atoms = b""
        for p in paras:
            try:
                atoms += record(0, _TEXT_BYTES_ATOM, p.encode("cp1252"))
            except UnicodeEncodeError:
                atoms += record(
                    0, _TEXT_CHARS_ATOM, p.encode("utf-16-le")
                )
        slide_recs.append(record(0x000F, _SLIDE_CONTAINER, atoms))
    doc = record(0x000F, _DOCUMENT_CONTAINER, b"".join(slide_recs))
    return encode_cfb([
        ("PowerPoint Document", doc),
        ("Current User", b"\x00" * 32),
    ])
