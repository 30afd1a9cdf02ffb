"""Legacy Excel binary (.xls, BIFF8) text extraction — pure stdlib,
from the public [MS-XLS] specification over the [MS-CFB] container
(:mod:`.cfb`).

The Workbook stream is a sequence of (type, length, data) records:
a globals substream (BOF … EOF) holding the Shared String Table and
the sheet directory, then one substream per sheet. The reader does
the real walk: SST strings in both encodings (compressed low-byte
and UTF-16), rich-run/extended tails skipped by declared length, and
— the part naive parsers corrupt — CONTINUE records, where a string
may break at a character boundary and every continuation fragment
restarts with its own encoding flag byte. Cells come from LABELSST
(SST references), NUMBER (IEEE doubles) and RK (packed 30-bit
int/float with the /100 flag) records, emitted per sheet as
tab-joined rows in (row, col) order. Encrypted workbooks (FILEPASS)
refuse by name.

Contract: ValueError only (fuzz-pinned). Reached through
``office_extract_text`` dispatch, the WARC glue
(application/vnd.ms-excel) and ``read_office_documents``.
"""

from __future__ import annotations

import struct

from vectra_py_spark.operators.cfb import CfbReader, encode_cfb

__all__ = ["xls_extract_text", "encode_xls"]

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_NUMBER = 0x0203
_RK = 0x027E
_BOUNDSHEET = 0x0085
_FILEPASS = 0x002F


def _records(data: bytes):
    pos = 0
    while pos + 4 <= len(data):
        rtype, rlen = struct.unpack_from("<HH", data, pos)
        body = data[pos + 4 : pos + 4 + rlen]
        if len(body) < rlen:
            raise ValueError(".xls record truncated")
        yield rtype, body
        pos += 4 + rlen


class _SstReader:
    """Byte cursor over the SST record + its CONTINUE fragments.
    Fixed-width fields span fragments transparently; character data
    re-reads the per-fragment encoding flag at each break (the BIFF8
    continuation rule)."""

    def __init__(self, frags: list[bytes]) -> None:
        self.frags = frags
        self.i = 0
        self.p = 0

    def _remaining(self) -> int:
        return len(self.frags[self.i]) - self.p

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n:
            if self.i >= len(self.frags):
                raise ValueError(".xls SST truncated mid-field")
            take = min(n, self._remaining())
            if take == 0:
                self.i += 1
                self.p = 0
                continue
            out += self.frags[self.i][self.p : self.p + take]
            self.p += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        out: list[str] = []
        while cch:
            while self.i < len(self.frags) and self._remaining() == 0:
                self.i += 1
                self.p = 0
                if self.i < len(self.frags):
                    # continuation fragment: fresh encoding flag byte
                    high = bool(self.read(1)[0] & 0x01)
            if self.i >= len(self.frags):
                raise ValueError(".xls SST truncated mid-string")
            width = 2 if high else 1
            take = min(cch, self._remaining() // width)
            if take == 0:
                raise ValueError(
                    ".xls SST character split across CONTINUE"
                )
            raw = self.read(take * width)
            # compressed chars are the low bytes of UTF-16 code units,
            # i.e. exactly latin-1
            out.append(
                raw.decode("utf-16-le" if high else "latin-1",
                           "replace")
            )
            cch -= take
        return "".join(out)


def _parse_sst(frags: list[bytes]) -> list[str]:
    r = _SstReader(frags)
    _total, unique = struct.unpack("<II", r.read(8))
    if unique > 1 << 24:
        raise ValueError(".xls SST declares absurd string count")
    out: list[str] = []
    for _ in range(unique):
        (cch,) = struct.unpack("<H", r.read(2))
        grbit = r.read(1)[0]
        if grbit & 0xF2:
            raise ValueError(f".xls SST string with bad flags {grbit:#x}")
        crun = struct.unpack("<H", r.read(2))[0] if grbit & 0x08 else 0
        cbext = struct.unpack("<I", r.read(4))[0] if grbit & 0x04 else 0
        out.append(r.read_chars(cch, bool(grbit & 0x01)))
        r.read(4 * crun)   # rich-format runs
        r.read(cbext)      # extended (phonetic) block
    return out


def _rk_value(raw: int) -> float:
    if raw & 0x02:  # 30-bit signed integer
        v = raw >> 2
        if v & 0x20000000:
            v -= 0x40000000
        num = float(v)
    else:           # high 30 bits of an IEEE double
        (num,) = struct.unpack("<d", struct.pack(
            "<Q", (raw & 0xFFFFFFFC) << 32
        ))
    return num / 100.0 if raw & 0x01 else num


def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() and abs(v) < 1e15 else (
        repr(v)
    )


def xls_extract_text(payload: bytes) -> list[str]:
    """Legacy .xls bytes → one text string per sheet (substream
    order), rows as tab-joined cell lines in (row, col) order."""
    try:
        return _xls_extract(payload)
    except struct.error as exc:
        # mutated record bodies shorter than their cell structs leak
        # struct.error from unpack_from — found by the fuzz campaign
        raise ValueError(f"malformed .xls record: {exc}") from exc


def _xls_extract(payload: bytes) -> list[str]:
    cfb = CfbReader(payload)
    name = next(
        (n for n in ("Workbook", "Book") if cfb.has(n)), None
    )
    if name is None:
        raise ValueError(
            "OLE payload has no Workbook stream — not a .xls"
        )
    data = cfb.stream(name)
    sst: list[str] = []
    sheets: list[dict[tuple[int, int], str]] = []
    depth = 0           # BOF/EOF nesting (charts nest inside sheets)
    sst_frags: list[bytes] | None = None
    for rtype, body in _records(data):
        if sst_frags is not None and rtype == _CONTINUE:
            sst_frags.append(body)
            continue
        if sst_frags is not None:
            sst = _parse_sst(sst_frags)
            sst_frags = None
        if rtype == _FILEPASS:
            raise ValueError("encrypted .xls — unsupported by design")
        if rtype == _BOF:
            depth += 1
            if depth == 1 and sheets:
                sheets.append({})
            elif depth == 1 and not sheets:
                sheets.append({})  # globals placeholder (index 0)
        elif rtype == _EOF:
            depth = max(0, depth - 1)
        elif rtype == _SST:
            sst_frags = [body]
        elif rtype == _LABELSST and sheets and depth == 1:
            row, col, _ixfe, isst = struct.unpack_from("<HHHI", body, 0)
            if isst >= len(sst):
                raise ValueError(".xls LABELSST past the SST")
            sheets[-1][(row, col)] = sst[isst]
        elif rtype == _NUMBER and sheets and depth == 1:
            row, col, _ixfe = struct.unpack_from("<HHH", body, 0)
            (num,) = struct.unpack_from("<d", body, 6)
            sheets[-1][(row, col)] = _fmt_num(num)
        elif rtype == _RK and sheets and depth == 1:
            row, col, _ixfe, raw = struct.unpack_from("<HHHI", body, 0)
            sheets[-1][(row, col)] = _fmt_num(_rk_value(raw))
    if sst_frags is not None:  # SST was the last record
        sst = _parse_sst(sst_frags)
    if not sheets:
        raise ValueError(".xls Workbook stream has no substreams")
    out = []
    for cells in sheets[1:]:  # index 0 is the globals substream
        rows: dict[int, dict[int, str]] = {}
        for (r, c), v in cells.items():
            rows.setdefault(r, {})[c] = v
        lines = []
        for r in sorted(rows):
            cols = rows[r]
            width = max(cols) + 1
            lines.append("\t".join(
                cols.get(c, "") for c in range(width)
            ))
        out.append("\n".join(lines))
    if not out:
        raise ValueError(".xls has no sheet substreams")
    return out


# ---------------------------------------------------------------------------
# Writer (fixtures): BIFF8 with both SST encodings, LABELSST + NUMBER
# cells, and an optional forced CONTINUE split so the reader's
# continuation path round-trips against independently written bytes.
# ---------------------------------------------------------------------------
def _rec(rtype: int, body: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(body)) + body


def _bof(dt: int) -> bytes:
    return _rec(_BOF, struct.pack(
        "<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0
    ))


def encode_xls(
    sheets: list[list[list[str]]],
    sst_split: bool = False,
) -> bytes:
    """Per-sheet grids → a minimal valid BIFF8 .xls. Numeric-looking
    cells become NUMBER records; strings go to the SST (compressed
    when latin-1-able, UTF-16 otherwise). ``sst_split=True`` breaks
    the SST into a CONTINUE at a string boundary with a fresh flag
    byte — the continuation rule the reader must honor."""
    if not sheets:
        raise ValueError("encode_xls needs at least one sheet")
    strings: list[str] = []
    sidx: dict[str, int] = {}

    def is_num(v: str) -> bool:
        try:
            float(v)
            return True
        except ValueError:
            return False

    sheet_cells: list[list[bytes]] = []
    for rows in sheets:
        recs = []
        for r, row in enumerate(rows):
            for c, val in enumerate(row):
                if is_num(val):
                    recs.append(_rec(_NUMBER, struct.pack(
                        "<HHHd", r, c, 0, float(val)
                    )))
                else:
                    if val not in sidx:
                        sidx[val] = len(strings)
                        strings.append(val)
                    recs.append(_rec(_LABELSST, struct.pack(
                        "<HHHI", r, c, 0, sidx[val]
                    )))
        sheet_cells.append(recs)

    def sst_string(s: str) -> bytes:
        try:
            raw = s.encode("latin-1")
            return struct.pack("<HB", len(raw), 0x00) + raw
        except UnicodeEncodeError:
            raw = s.encode("utf-16-le")
            # cch counts UTF-16 code UNITS — astral chars are 2
            return struct.pack("<HB", len(raw) // 2, 0x01) + raw

    blobs = [sst_string(s) for s in strings]
    head = struct.pack("<II", len(strings), len(strings))
    if sst_split and len(blobs) > 1:
        half = len(blobs) // 2
        sst_rec = _rec(_SST, head + b"".join(blobs[:half]))
        # continuation restarts with the NEXT string's own flag byte —
        # a string boundary split, the common writer behavior
        sst_rec += _rec(_CONTINUE, b"".join(blobs[half:]))
    else:
        sst_rec = _rec(_SST, head + b"".join(blobs))

    # two-pass assembly: BOUNDSHEET needs each sheet's BOF offset
    sheet_streams = [
        _bof(0x0010) + b"".join(recs) + _rec(_EOF, b"")
        for recs in sheet_cells
    ]

    def boundsheet(pos: int, name: str) -> bytes:
        raw = name.encode("latin-1", "replace")[:31]
        return _rec(_BOUNDSHEET, struct.pack(
            "<IHBB", pos, 0, len(raw), 0
        ) + raw)

    for _ in range(2):  # fixed point: offsets stabilize in two passes
        bs = b"".join(
            boundsheet(0, f"Sheet{i + 1}")
            for i in range(len(sheets))
        )
        globals_stream = _bof(0x0005) + bs + sst_rec + _rec(_EOF, b"")
        offsets = []
        pos = len(globals_stream)
        for ss in sheet_streams:
            offsets.append(pos)
            pos += len(ss)
        bs = b"".join(
            boundsheet(offsets[i], f"Sheet{i + 1}")
            for i in range(len(sheets))
        )
        globals_stream = _bof(0x0005) + bs + sst_rec + _rec(_EOF, b"")
    workbook = globals_stream + b"".join(sheet_streams)
    return encode_cfb([("Workbook", workbook)])
