"""PDF text extraction — pure stdlib, from the public spec (ISO 32000 /
the Adobe PDF 1.7 reference): the remaining big corpus source a
training-data pipeline meets after HTML (WARC) and plain dumps (JSONL).

Honest scope, stated plainly: simple-font, non-encrypted PDFs with
classic cross-reference TABLES (the format every tool can write and
most corpus PDFs use). The parser walks the trailer → Root → Pages
tree for real (indirect references, inheritance through Kids, multiple
Contents streams, FlateDecode via stdlib zlib), and the content-stream
tokenizer understands the full string syntax (escapes, octal, balanced
parens, hex strings) and every text-showing operator (Tj ' \" TJ) plus
the line-advance operators (Td TD T* TL) that give extracted text its
line structure. What it does NOT do — CID/Type0 composite fonts
(CJK subsetting), encryption, xref STREAMS (PDF 1.5 compressed xref),
predictors — raises a clear ValueError naming the gap, never silently
wrong text: the same declared-gate discipline as the MP3/H.264 codec
gaps.

Contract: malformed payloads raise :class:`ValueError`
(fuzz-hardened). Scale shape: per-payload parse inside the worker
(mapInPandas callers), linear in payload bytes; PDFs never enter a
shuffle.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["encode_pdf", "pdf_extract_text", "pdf_info", "synth_pdf"]


# ---------------------------------------------------------------------------
# Writer (synthesis for tests/demos — a real, spec-valid PDF 1.4)
# ---------------------------------------------------------------------------
def _escape_pdf_string(s: str) -> bytes:
    out = s.encode("latin-1", "replace")
    return (
        out.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
    )


def encode_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """List of pages, each a list of text lines → a valid PDF 1.4 with
    one Helvetica content stream per page (FlateDecode when
    ``compress``) and a classic xref table."""
    if not pages:
        raise ValueError("encode_pdf needs at least one page")
    objs: list[bytes] = []  # 1-indexed

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    page_ids = []
    content_ids = []
    font_id = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    pages_id_placeholder = None
    for lines in pages:
        ops = [b"BT /F1 12 Tf 14 TL 72 760 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"T*")
            ops.append(b"(" + _escape_pdf_string(line) + b") Tj")
        ops.append(b"ET")
        stream = b" ".join(ops)
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        content_ids.append(add(
            b"<< " + filt + b"/Length " + str(len(stream)).encode()
            + b" >>\nstream\n" + stream + b"\nendstream"
        ))
    pages_id_placeholder = len(objs) + len(pages) + 1
    for cid in content_ids:
        page_ids.append(add(
            b"<< /Type /Page /Parent "
            + str(pages_id_placeholder).encode() + b" 0 R"
            + b" /MediaBox [0 0 612 792]"
            + b" /Resources << /Font << /F1 "
            + str(font_id).encode() + b" 0 R >> >>"
            + b" /Contents " + str(cid).encode() + b" 0 R >>"
        ))
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    pages_id = add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_ids)).encode() + b" >>"
    )
    assert pages_id == pages_id_placeholder
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_id, xref_at)
    )
    return bytes(out)


def synth_pdf(n_pages: int = 2, lines_per_page: int = 3) -> bytes:
    """Deterministic multi-page sample document."""
    return encode_pdf(
        [
            [f"Page {p} line {i} lorem ipsum" for i in range(lines_per_page)]
            for p in range(n_pages)
        ]
    )


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_WS = b"\x00\t\n\x0c\r "


class _Lexer:
    """Minimal PDF object lexer over a bytes window."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.d, len(self.d)
        while self.pos < n:
            c = self.d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                while self.pos < n and d[self.pos] not in (0x0A, 0x0D):
                    self.pos += 1
            else:
                return

    def parse(self):
        """One object: dict, array, name, number, string, ref, keyword."""
        self._skip_ws()
        d = self.d
        if self.pos >= len(d):
            raise ValueError("PDF object expected at end of data")
        c = d[self.pos]
        if d[self.pos : self.pos + 2] == b"<<":
            self.pos += 2
            out = {}
            while True:
                self._skip_ws()
                if d[self.pos : self.pos + 2] == b">>":
                    self.pos += 2
                    return out
                key = self.parse()
                if not isinstance(key, bytes) or not key.startswith(b"/"):
                    raise ValueError("PDF dict key must be a name")
                out[key] = self.parse()
        if c == 0x5B:  # [
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse())
        if c == 0x2F:  # /name
            start = self.pos
            self.pos += 1
            while self.pos < len(d) and d[self.pos] not in _WS and d[
                self.pos
            ] not in b"/[]<>()%":
                self.pos += 1
            return d[start : self.pos]
        if c == 0x28:  # (string)
            return self._string()
        if d[self.pos : self.pos + 1] == b"<":  # <hex>
            end = d.index(b">", self.pos)
            hexs = re.sub(rb"\s", b"", d[self.pos + 1 : end])
            if len(hexs) % 2:
                hexs += b"0"
            self.pos = end + 1
            return bytes.fromhex(hexs.decode("ascii"))
        # number / reference / keyword
        m = re.match(rb"[-+]?\d*\.?\d+", d[self.pos :])
        if m:
            tok = m.group(0)
            save = self.pos
            self.pos += len(tok)
            # N G R indirect reference?
            m2 = re.match(rb"\s+(\d+)\s+R\b", d[self.pos :])
            if m2 and b"." not in tok:
                self.pos += m2.end()
                return ("ref", int(tok), int(m2.group(1)))
            try:
                return float(tok) if b"." in tok else int(tok)
            except ValueError:
                self.pos = save
        m = re.match(rb"[A-Za-z]+", d[self.pos :])
        if m:
            self.pos += m.end()
            return ("kw", m.group(0))
        if c in (0x27, 0x22):  # ' and " — the text-showing quote ops
            self.pos += 1
            return ("kw", bytes([c]))
        raise ValueError(
            f"unparseable PDF object at byte {self.pos} "
            f"({d[self.pos:self.pos + 8]!r})"
        )

    def _string(self) -> bytes:
        d = self.d
        self.pos += 1
        out = bytearray()
        depth = 1
        while True:
            if self.pos >= len(d):
                raise ValueError("PDF string runs past end of data")
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                e = d[self.pos]
                esc = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                       0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
                if e in esc:
                    out.append(esc[e])
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_s = bytearray()
                    while len(oct_s) < 3 and 0x30 <= d[self.pos] <= 0x37:
                        oct_s.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_s, 8) & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    self.pos += 1
                    if e == 0x0D and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1


class _Pdf:
    def __init__(self, payload: bytes) -> None:
        if payload[:5] != b"%PDF-":
            raise ValueError(f"not a PDF payload: {payload[:8]!r}")
        self.d = payload
        self.objs: dict[int, int] = {}  # obj number → byte offset
        for m in _OBJ_RE.finditer(payload):
            # keep the LAST definition (incremental updates append)
            self.objs[int(m.group(1))] = m.start()
        if not self.objs:
            raise ValueError("PDF contains no objects")
        t = payload.rfind(b"trailer")
        if t >= 0:
            lex = _Lexer(payload, t + len(b"trailer"))
            self.trailer = lex.parse()
            if not isinstance(self.trailer, dict):
                raise ValueError("PDF trailer is not a dictionary")
        else:
            # PDF 1.5+ cross-reference streams carry the trailer dict in
            # the stream dict; find an object with /Type /XRef
            self.trailer = None
            for num in self.objs:
                try:
                    od = self.obj(num)
                except ValueError:
                    continue
                if isinstance(od, dict) and od.get(b"/Type") == b"/XRef":
                    raise ValueError(
                        "PDF uses cross-reference STREAMS (PDF 1.5 "
                        "compressed xref) — unsupported without a PDF "
                        "library; classic xref tables only"
                    )
            raise ValueError("PDF missing trailer")
        if b"/Encrypt" in self.trailer:
            raise ValueError("encrypted PDF — unsupported by design")

    def obj(self, num: int):
        off = self.objs.get(num)
        if off is None:
            raise ValueError(f"PDF object {num} not found")
        m = _OBJ_RE.match(self.d, off)
        lex = _Lexer(self.d, m.end())
        val = lex.parse()
        if isinstance(val, dict):
            lex._skip_ws()
            if self.d[lex.pos : lex.pos + 6] == b"stream":
                p = lex.pos + 6
                if self.d[p : p + 2] == b"\r\n":
                    p += 2
                elif self.d[p : p + 1] in (b"\n", b"\r"):
                    p += 1
                length = self.deref(val.get(b"/Length"))
                if not isinstance(length, int) or length < 0:
                    raise ValueError("PDF stream with bad /Length")
                raw = self.d[p : p + length]
                if len(raw) != length:
                    raise ValueError("PDF stream truncated")
                return ("stream", val, raw)
        return val

    def deref(self, v):
        seen = 0
        while isinstance(v, tuple) and len(v) == 3 and v[0] == "ref":
            v = self.obj(v[1])
            seen += 1
            if seen > 32:
                raise ValueError("PDF reference cycle")
        return v

    def stream_data(self, v) -> bytes:
        v = self.deref(v)
        if not (isinstance(v, tuple) and len(v) == 3 and v[0] == "stream"):
            raise ValueError("PDF stream object expected")
        _tag, sd, raw = v
        filt = self.deref(sd.get(b"/Filter"))
        if filt is None:
            return raw
        filters = filt if isinstance(filt, list) else [filt]
        data = raw
        for f in filters:
            f = self.deref(f)
            if f == b"/FlateDecode":
                if b"/DecodeParms" in sd and self.deref(sd[b"/DecodeParms"]):
                    raise ValueError(
                        "PDF FlateDecode with predictor DecodeParms — "
                        "unsupported"
                    )
                try:
                    data = zlib.decompress(data)
                except zlib.error as exc:
                    raise ValueError(
                        f"corrupt PDF Flate stream: {exc}"
                    ) from exc
            else:
                raise ValueError(
                    f"unsupported PDF stream filter {f!r} — FlateDecode "
                    "or none"
                )
        return data

    def pages(self) -> list[dict]:
        root = self.deref(self.trailer.get(b"/Root"))
        if not isinstance(root, dict):
            raise ValueError("PDF trailer /Root missing or not a dict")
        out: list[dict] = []

        def walk(node, depth=0):
            node = self.deref(node)
            if not isinstance(node, dict):
                raise ValueError("PDF page-tree node is not a dict")
            if depth > 64:
                raise ValueError("PDF page tree too deep")
            t = node.get(b"/Type")
            if t == b"/Pages" or (t is None and b"/Kids" in node):
                for kid in self.deref(node.get(b"/Kids")) or []:
                    walk(kid, depth + 1)
            elif t == b"/Page":
                out.append(node)
            else:
                raise ValueError(f"unexpected PDF page-tree type {t!r}")

        walk(root.get(b"/Pages"))
        if not out:
            raise ValueError("PDF has no pages")
        return out


def _page_text(pdf: _Pdf, page: dict) -> str:
    contents = pdf.deref(page.get(b"/Contents"))
    if contents is None:
        return ""
    parts = contents if isinstance(contents, list) else [contents]
    data = b"".join(pdf.stream_data(c) for c in parts)
    # check the page's fonts are simple (composite fonts would make the
    # string bytes CID codes, not characters — refuse, never mojibake)
    res = pdf.deref(page.get(b"/Resources")) or {}
    fonts = pdf.deref(res.get(b"/Font")) if isinstance(res, dict) else None
    if isinstance(fonts, dict):
        for fobj in fonts.values():
            fd = pdf.deref(fobj)
            if isinstance(fd, dict) and fd.get(b"/Subtype") == b"/Type0":
                raise ValueError(
                    "PDF uses a composite (Type0/CID) font — text bytes "
                    "are CID codes; unsupported without a PDF library"
                )
    lex = _Lexer(data)
    stack: list = []
    lines: list[str] = [""]

    def show(sbytes: bytes) -> None:
        lines[-1] += sbytes.decode("latin-1")

    while True:
        lex._skip_ws()
        if lex.pos >= len(data):
            break
        tok = lex.parse()
        if isinstance(tok, tuple) and tok[0] == "kw":
            op = tok[1]
            if op == b"Tj" and stack:
                show(stack[-1] if isinstance(stack[-1], bytes) else b"")
            elif op in (b"'", b'"') and stack:
                lines.append("")
                show(stack[-1] if isinstance(stack[-1], bytes) else b"")
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        show(el)
            elif op in (b"Td", b"TD", b"T"):
                # T* arrives as kw b"T" + a literal '*' byte; Td/TD with
                # a negative y advance also mean "next line"
                if op == b"T" and data[lex.pos : lex.pos + 1] == b"*":
                    lex.pos += 1
                    lines.append("")
                elif op in (b"Td", b"TD") and len(stack) >= 2:
                    try:
                        if float(stack[-1]) < 0:
                            lines.append("")
                    except (TypeError, ValueError):
                        pass
            elif op == b"BT":
                if lines[-1]:
                    lines.append("")
            stack.clear()
        else:
            stack.append(tok)
    return "\n".join(line for line in lines if line != "") if any(
        lines
    ) else ""


def pdf_extract_text(payload: bytes) -> list[str]:
    """PDF bytes → one extracted-text string per page. Unsupported
    constructs (encryption, xref streams, composite fonts, exotic
    filters) refuse with a ValueError naming the gap."""
    try:
        pdf = _Pdf(payload)
        return [_page_text(pdf, p) for p in pdf.pages()]
    except (IndexError, KeyError, re.error, UnicodeDecodeError,
            RecursionError, OverflowError, MemoryError,
            AttributeError, TypeError) as exc:
        # AttributeError/TypeError: corrupt files can put ANY object
        # type where a dict/array was expected — found by the extended
        # fuzz pass; structural type confusion is malformed input, not
        # a crash
        raise ValueError(f"malformed PDF payload: {exc}") from exc


def pdf_info(payload: bytes) -> dict:
    """Header-level probe: version + page count (no text decode)."""
    try:
        pdf = _Pdf(payload)
        version = payload[5:8].decode("latin-1", "replace")
        return {"version": version, "n_pages": len(pdf.pages())}
    except (IndexError, KeyError, re.error, UnicodeDecodeError,
            RecursionError, OverflowError, MemoryError,
            AttributeError, TypeError) as exc:
        raise ValueError(f"malformed PDF payload: {exc}") from exc


def extract_pdf_text_df(
    df,
    data_col: str = "data",
    id_col: str = "media_id",
    on_error: str = "fail",
):
    """Binary PDF payloads → one row per page: (media_id, page, text
    [, error under quarantine]) — the same contract shape as
    ``extract_features``: 'fail' propagates the first ValueError,
    'quarantine' keeps a single error row per bad payload (page -1,
    NULL text) and the stage flows on. Narrow ``mapInPandas``, no
    shuffle, payloads stay in the worker."""
    from collections.abc import Iterator

    import pandas as pd

    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine, got {on_error!r}")
    quarantine = on_error == "quarantine"

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf_batch in batches:
            rows = {"media_id": [], "page": [], "text": [], "error": []}
            for mid, b in zip(pdf_batch[id_col], pdf_batch[data_col]):
                payload = bytes(b) if b is not None else b""
                try:
                    for p, text in enumerate(pdf_extract_text(payload)):
                        rows["media_id"].append(str(mid))
                        rows["page"].append(p)
                        rows["text"].append(text)
                        rows["error"].append(None)
                except ValueError as exc:
                    if not quarantine:
                        raise
                    rows["media_id"].append(str(mid))
                    rows["page"].append(-1)
                    rows["text"].append(None)
                    rows["error"].append(str(exc))
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, schema="media_id STRING, page INT, text STRING, error STRING"
    )
