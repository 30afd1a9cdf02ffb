"""JPEG codec (baseline sequential + progressive) with zero codec
dependencies.

Decoder: ITU-T T.81 DCT with Huffman entropy coding — marker parse
(SOI/APPn/COM/DQT/DHT/SOF0/SOF2/DRI/SOS/RSTn/EOI), canonical Huffman
code construction, byte-unstuffed bit reading, per-block DC-difference
+ AC run-length decode, dequantize, dezigzag, float IDCT (orthonormal
8×8 basis matrix), chroma upsample by pixel replication, YCbCr→RGB per
JFIF. Grayscale (1 component) and YCbCr (3 components) at arbitrary
standard sampling factors (4:4:4, 4:2:0, 4:2:2, …). Progressive
(SOF2) decodes in full: spectral-selection bands, successive-
approximation DC/AC refinement bit-planes (T.81 Annex G, the libjpeg
refine structure), EOB runs, per-scan Huffman redefinition, and
restart intervals. Arithmetic coding, hierarchical, and 12-bit frames
— and ANY malformed payload (truncated marker segment, truncated
entropy stream, invalid Huffman code, missing tables) — refuse with
:class:`ValueError`, the single exception type the multimodal feature
pass contracts on.

Encoder: the inverse — the spec's example tables (ITU-T T.81 Annex K
quantization matrices scaled by the public libjpeg quality formula,
Annex K Huffman tables), 4:4:4 or 4:2:0 chroma subsampling (box
mean), level shift, float FDCT, half-away-from-zero quantization,
zigzag, Huffman coding with 0xFF byte stuffing; ``progressive=True``
re-transmits the same coefficients as an SOF2 scan script (lossless
reorganization — pixel-identical to baseline by construction and by
test).

This is the PNG precedent (``multimodal.decode_png``) extended to the
dominant compressed image format a 100 TB image-text pipeline actually
ingests. The reference engine has no image path at all (its multimodal
story stops at text; see SURVEY.md §2) — this module is part of the
beyond-reference pipeline surface, kept to the same contracts as the
reference-parity operators (ValueError-only refusal, oracle-checked
end-to-end via ``jpeg_roundtrip``). Per-scanline/pure-numpy performance is adequate for feature
extraction at fixture scale; register a codec library (PIL/libjpeg) in
``multimodal.DECODERS`` for bulk decode throughput — the Spark-side
plumbing is identical either way.

All table constants below are the public example tables from ITU-T
T.81 Annex K (the de-facto interchange defaults every JPEG tool
ships); the quality scaling is the public libjpeg formula.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# Zigzag scan order: entry k is the natural (row-major) index of the
# k-th coefficient in zigzag order (ITU-T T.81 Figure 5).
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K Table K.1/K.2 quantization matrices (natural row-major order)
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman tables: (bits[1..16] code counts, symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _basis() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis: A[x, u] = c(u)/2 · cos((2x+1)uπ/16)
    with c(0)=1/√2 else 1. IDCT is ``A @ F @ A.T``; FDCT is
    ``A.T @ f @ A`` (A is orthogonal — asserted in tests)."""
    x = np.arange(8)[:, None]
    u = np.arange(8)[None, :]
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[:, 0] /= np.sqrt(2.0)
    return a


_A = _basis()


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero rounding (np.round is half-even, which
    neither DuckDB nor the oracle arithmetic uses)."""
    return np.trunc(x + np.copysign(0.5, x))


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------
def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 Annex C): symbol → (code,
    length). Codes of each length are consecutive; moving to the next
    length shifts left once."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol map for bit-serial decoding."""
    if sum(bits) != len(vals):
        raise ValueError("JPEG Huffman table: code counts != symbol count")
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s-bit magnitude value to its signed
    coefficient (values with a 0 high bit are negative)."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential JPEG → uint8 array of shape (h, w, 3) RGB
    (3-component YCbCr frames) or (h, w, 1) (grayscale frames). Any
    malformed or unsupported payload raises :class:`ValueError`."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as exc:
        raise ValueError(f"malformed JPEG payload: {exc}") from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG payload: {payload[:2]!r}")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    restart_interval = 0

    while True:
        if pos + 4 > len(payload):
            raise ValueError("JPEG truncated before SOS")
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2) — skip
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("JPEG ended before scan data")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG marker segment truncated")
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                    p += 64
                elif pq == 1:
                    vals = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                nat = np.zeros(64, np.int64)
                nat[_ZIGZAG] = vals  # DQT ships zigzag order
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("JPEG DHT truncated")
                htables[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 prog.
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if h == 0 or w == 0:
                raise ValueError(f"malformed JPEG dimensions ({w}x{h})")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                ch, cv = hv >> 4, hv & 15
                # T.81 B.2.2: sampling factors are 1..4; zero would
                # divide-by-zero downstream, breaking the ValueError-only
                # contract extract_features(on_error='quarantine') relies on.
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(
                        f"malformed JPEG sampling factors {ch}x{cv}"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG frame type "
                f"SOF{marker - 0xC0} — only baseline sequential (SOF0/SOF1) "
                "and progressive (SOF2) Huffman frames supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tds >> 4, tds & 15))
            if progressive:
                ss, se, ahal = struct.unpack_from(
                    ">BBB", seg, 1 + 2 * ns
                )
                return _decode_progressive(
                    payload, pos, frame, (scan, ss, se, ahal >> 4, ahal & 15),
                    qtables, htables, restart_interval,
                )
            return _decode_scan(
                payload, pos, frame, scan, qtables, htables, restart_interval
            )
        # APPn / COM / others: skipped


def _entropy_segments(payload: bytes, pos: int) -> list[bytes]:
    """Unstuff the entropy-coded data from SOS to EOI, split at RSTn
    markers → one bytes object per restart segment."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            raise ValueError("JPEG entropy stream truncated at 0xFF")
        m = payload[pos + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        elif m == 0xD9:  # EOI
            segs.append(bytes(cur))
            return segs
        else:
            raise ValueError(f"unexpected marker 0xFF{m:02X} in JPEG scan")
    raise ValueError("JPEG missing EOI")


def _decode_scan(payload, pos, frame, scan, qtables, htables, restart_interval):
    h, w, comps = frame
    if len(scan) != len(comps):
        raise ValueError("JPEG non-interleaved multi-scan not supported")
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        c = dict(by_id[cs])
        if c["tq"] not in qtables:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("JPEG missing Huffman table for scan")
        c["dc"] = htables[(0, td)]
        c["ac"] = htables[(1, ta)]
        c["q"] = qtables[c["tq"]].astype(np.float64)
        order.append(c)

    hmax = max(c["h"] for c in order)
    vmax = max(c["v"] for c in order)
    if any(hmax % c["h"] or vmax % c["v"] for c in order):
        raise ValueError("unsupported JPEG sampling factors")

    if len(order) == 1:
        # T.81 A.2: a one-component scan is NON-interleaved — one block
        # per MCU, row-major over the component's own ceil(dims/8) grid,
        # sampling factors ignored. Grayscale frames that retain 2x2
        # sampling would otherwise decode in scrambled (MCU) block order.
        c = order[0]
        bh, bw = -(-h // 8), -(-w // 8)
        c["plane"] = np.zeros((bh * 8, bw * 8))
        c["pred"] = 0
        segs = _entropy_segments(payload, pos)
        seg_i = 0
        br = _BitReader(segs[0])
        n_blk = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and n_blk and n_blk % restart_interval == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise ValueError("JPEG missing restart segment")
                    br = _BitReader(segs[seg_i])
                    c["pred"] = 0
                blk = _decode_block(br, c)
                c["plane"][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
                n_blk += 1
        return _finish_planes(order, h, w, c["h"], c["v"])

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in order:
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        c["pred"] = 0

    segs = _entropy_segments(payload, pos)
    seg_i = 0
    br = _BitReader(segs[0])
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                br = _BitReader(segs[seg_i])
                for c in order:
                    c["pred"] = 0
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(br, c)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk
            n_mcu += 1

    return _finish_planes(order, h, w, hmax, vmax)


def _finish_planes(order, h, w, hmax, vmax) -> np.ndarray:
    """Upsample each component plane to full resolution, crop to the
    frame, and convert YCbCr→RGB (or pass grayscale through) — the
    shared tail of the baseline and progressive decode paths."""
    planes = []
    for c in order:
        p = np.repeat(
            np.repeat(c["plane"], vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(p[:h, :w])
    if len(planes) == 1:
        gray = np.clip(_round_half_away(planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(_round_half_away(rgb), 0, 255).astype(np.uint8)


def _decode_block(br: _BitReader, c: dict) -> np.ndarray:
    """One 8×8 data unit: Huffman DC diff + AC run-lengths → dezigzag →
    dequantize → IDCT → level-shifted float block."""
    zz = np.zeros(64)
    s = _decode_symbol(br, c["dc"])
    diff = _extend(br.read_bits(s), s)
    c["pred"] += diff
    zz[0] = c["pred"]
    k = 1
    while k < 64:
        rs = _decode_symbol(br, c["ac"])
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index out of range")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    nat = np.zeros(64)
    nat[_ZIGZAG] = zz
    coeffs = nat.reshape(8, 8) * c["q"]
    return _A @ coeffs @ _A.T + 128.0


# ---------------------------------------------------------------------------
# Progressive decoder (SOF2): coefficients accumulate across scans —
# spectral selection bands + successive-approximation bit planes — and
# the IDCT runs once at the end. T.81 Annex G.
# ---------------------------------------------------------------------------
def _entropy_until_marker(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff entropy data from ``pos`` up to the next non-RST marker,
    split at RSTn boundaries. Returns (segments, position of the 0xFF
    of the terminating marker)."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            raise ValueError("JPEG entropy stream truncated at 0xFF")
        m = payload[pos + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            segs.append(bytes(cur))
            return segs, pos
    raise ValueError("JPEG progressive stream truncated (no trailing marker)")


def _decode_progressive(
    payload, pos, frame, first_scan, qtables, htables, restart_interval
):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(hmax % c["h"] or vmax % c["v"] for c in comps):
        raise ValueError("unsupported JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        # coefficient store in ZIGZAG order, sized to the MCU grid (the
        # non-interleaved grid ceil(sampled/8) is always ≤ it)
        c["bh"] = -(-(-(-h * c["v"] // vmax)) // 8)
        c["bw"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
        if c["tq"] not in qtables:
            raise ValueError(f"JPEG missing quant table {c['tq']}")

    by_id = {c["id"]: c for c in comps}
    scan = first_scan
    while True:
        pos = _progressive_scan(
            payload, pos, scan, by_id, htables, restart_interval,
            mcux, mcuy,
        )
        # parse inter-scan markers until the next SOS or EOI
        scan = None
        while scan is None:
            if payload[pos] != 0xFF:
                raise ValueError(f"JPEG marker expected at offset {pos}")
            marker = payload[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            pos += 2
            if marker == 0xD9:  # EOI — all scans done
                order = list(comps)
                for c in order:
                    # quant table natural→zigzag to match the coef store
                    q = qtables[c["tq"]].astype(np.float64).reshape(64)[
                        _ZIGZAG
                    ]
                    plane = np.zeros(
                        (c["coef"].shape[0] * 8, c["coef"].shape[1] * 8)
                    )
                    nat = np.zeros(64)
                    for by in range(c["coef"].shape[0]):
                        for bx in range(c["coef"].shape[1]):
                            zz = c["coef"][by, bx] * q
                            nat[_ZIGZAG] = zz
                            blk = _A @ nat.reshape(8, 8) @ _A.T + 128.0
                            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
                    c["plane"] = plane
                return _finish_planes(order, h, w, hmax, vmax)
            (seglen,) = struct.unpack_from(">H", payload, pos)
            seg = payload[pos + 2 : pos + seglen]
            if len(seg) != seglen - 2:
                raise ValueError("JPEG marker segment truncated")
            pos += seglen
            if marker == 0xC4:  # DHT (tables may be redefined per scan)
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    bits = list(seg[p + 1 : p + 17])
                    nv = sum(bits)
                    vals = list(seg[p + 17 : p + 17 + nv])
                    if len(vals) != nv:
                        raise ValueError("JPEG DHT truncated")
                    htables[(tc, th)] = _decode_table(bits, vals)
                    p += 17 + nv
            elif marker == 0xDD:
                (restart_interval,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:
                ns = seg[0]
                sc = []
                for i in range(ns):
                    cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                    sc.append((cs, tds >> 4, tds & 15))
                ss, se, ahal = struct.unpack_from(">BBB", seg, 1 + 2 * ns)
                scan = (sc, ss, se, ahal >> 4, ahal & 15)
            # DQT/APPn/COM between scans: skipped (DQT must precede
            # the first scan per Annex G; tables are frozen here)


def _progressive_scan(
    payload, pos, scan_params, by_id, htables, restart_interval, mcux, mcuy
):
    scan, ss, se, ah, al = scan_params
    if not scan or not 0 <= ss <= se <= 63 or se > 63:
        raise ValueError("malformed JPEG progressive scan header")
    segs, end_pos = _entropy_until_marker(payload, pos)
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        c = by_id[cs]
        if ss == 0 and ah == 0:
            if (0, td) not in htables:
                raise ValueError("JPEG missing DC Huffman table for scan")
            c["dct"] = htables[(0, td)]
        if ss > 0:
            if (1, ta) not in htables:
                raise ValueError("JPEG missing AC Huffman table for scan")
            c["act"] = htables[(1, ta)]
        order.append(c)
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG DC progressive scan must have Se=0")
        _dc_scan(order, segs, ah, al, restart_interval, mcux, mcuy)
    else:
        if len(order) != 1:
            raise ValueError("JPEG progressive AC scan must be single-component")
        _ac_scan(order[0], segs, ss, se, ah, al, restart_interval)
    return end_pos


def _check_dc(v: int) -> int:
    """Corrupt entropy data can walk the DC predictor arbitrarily far
    (each bogus diff accumulates); the coefficient store is int32, so
    an unchecked store raises OverflowError instead of the contractual
    ValueError (found by the codec fuzz harness). Any legitimate 8-bit
    DC coefficient is tiny compared to this bound."""
    if not -(1 << 31) <= v < (1 << 31):
        raise ValueError("JPEG DC coefficient out of range (corrupt stream)")
    return v


def _dc_scan(order, segs, ah, al, restart_interval, mcux, mcuy):
    """DC first pass (Huffman diff, point-transformed by Al) or DC
    refinement (one raw bit per block)."""
    for c in order:
        c["pred"] = 0
    seg_i = 0
    br = _BitReader(segs[0])
    n_mcu = 0
    if len(order) == 1:
        # Non-interleaved single-component DC scan (T.81 A.2): one block
        # per MCU, row-major over the component's own bh×bw grid — the
        # same grid _ac_scan already walks.
        c = order[0]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise ValueError("JPEG missing restart segment")
                    br = _BitReader(segs[seg_i])
                    c["pred"] = 0
                blk = c["coef"][by, bx]
                if ah == 0:
                    s = _decode_symbol(br, c["dct"])
                    diff = _extend(br.read_bits(s), s)
                    c["pred"] += diff
                    blk[0] = _check_dc(c["pred"] << al)
                else:
                    if br.read_bit():
                        blk[0] |= 1 << al
                n_mcu += 1
        return
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                br = _BitReader(segs[seg_i])
                for c in order:
                    c["pred"] = 0
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                        if ah == 0:
                            s = _decode_symbol(br, c["dct"])
                            diff = _extend(br.read_bits(s), s)
                            c["pred"] += diff
                            blk[0] = _check_dc(c["pred"] << al)
                        else:
                            if br.read_bit():
                                blk[0] |= 1 << al
            n_mcu += 1


def _ac_scan(c, segs, ss, se, ah, al, restart_interval):
    """AC band scan over the component's own (non-interleaved) block
    grid: first pass with EOB-run coding, or the successive-
    approximation refinement pass (T.81 G.1.2.3)."""
    blocks = [
        c["coef"][by, bx]
        for by in range(c["bh"])
        for bx in range(c["bw"])
    ]
    act = c["act"]
    seg_i = 0
    br = _BitReader(segs[0])
    eobrun = 0
    for n_blk, zz in enumerate(blocks):
        if restart_interval and n_blk and n_blk % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            br = _BitReader(segs[seg_i])
            eobrun = 0
        if ah == 0:
            eobrun = _ac_first_block(br, act, zz, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_block(br, act, zz, ss, se, al, eobrun)


def _ac_first_block(br, act, zz, ss, se, al, eobrun) -> int:
    """First AC pass for one block; returns the count of FOLLOWING
    blocks the current EOB run still skips."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            return (1 << r) - 1 + (br.read_bits(r) if r else 0)  # EOBn
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC index out of band")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, act, zz, ss, se, al, eobrun) -> int:
    """Successive-approximation AC refinement for one block (T.81
    G.1.2.3 / the libjpeg decode_mcu_AC_refine structure). The EOB-run
    counter here INCLUDES the current block, because a block that
    declares (or sits inside) an EOB run still receives correction
    bits for its already-nonzero band coefficients."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(br, act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + (br.read_bits(r) if r else 0)
                    break  # current block finishes inside the run below
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement magnitude must be 1")
                val = p1 if br.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    # correction bit for an already-nonzero coefficient
                    if br.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
        else:
            return 0  # band fully coded, no EOB run in effect
    # inside an EOB run: correction bits still flow for the remaining
    # nonzero coefficients of this block's band
    while k <= se:
        if zz[k] != 0:
            if br.read_bit() and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] > 0 else m1
        k += 1
    return eobrun - 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align_marker(self, m: int) -> None:
        """Byte-align (1-bit padding) then emit a raw RSTn marker —
        markers are never byte-stuffed."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, m])

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bit padding per spec
        return bytes(self.buf)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """Public libjpeg quality scaling: 1..100 → scaled Annex K table."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """FDCT → quantize (half-away) → zigzag → Huffman. Returns the new
    DC predictor."""
    coeffs = _A.T @ (block - 128.0) @ _A
    q = _round_half_away(coeffs / qt).astype(np.int64)
    zz = q.reshape(64)[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


# ---------------------------------------------------------------------------
# Progressive encoder: the same quantized coefficients as baseline,
# transmitted as a spectral-selection + successive-approximation scan
# script (progressive is a lossless REORGANIZATION — pinned in tests by
# exact pixel equality against the baseline pipeline).
# ---------------------------------------------------------------------------
def _quantize_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """MCU-padded plane → (bh, bw, 64) int32 quantized coefficients in
    ZIGZAG order (the transmission order every scan type walks)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.empty((bh, bw, 64), np.int32)
    for by in range(bh):
        for bx in range(bw):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coeffs = _A.T @ (blk - 128.0) @ _A
            q = _round_half_away(coeffs / qt).astype(np.int32)
            out[by, bx] = q.reshape(64)[_ZIGZAG]
    return out


def _sos_header(scan_comps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
    body = bytes([len(scan_comps)])
    for cid, td, ta in scan_comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return struct.pack(">BBH", 0xFF, 0xDA, len(body) + 2) + body


def _emit_dc_first(bw, comps, mcux, mcuy, al):
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for by in range(c["hv"][1]):
                    for bx in range(c["hv"][0]):
                        v = int(
                            c["coefzz"][my * c["hv"][1] + by,
                                        mx * c["hv"][0] + bx, 0]
                        ) >> al  # DC point transform: arithmetic shift
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _category(diff)
                        code, ln = c["codes_dc"][s]
                        bw.write(code, ln)
                        if s:
                            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _emit_dc_refine(bw, comps, mcux, mcuy, al):
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                for by in range(c["hv"][1]):
                    for bx in range(c["hv"][0]):
                        v = int(
                            c["coefzz"][my * c["hv"][1] + by,
                                        mx * c["hv"][0] + bx, 0]
                        )
                        bw.write((v >> al) & 1, 1)


def _emit_ac_first(bw, c, ss, se, al):
    """AC band, first pass. EOB runs are capped at 1 (plain EOB0) so
    the Annex K AC tables suffice — the spec's longer EOBn codes need
    custom Huffman tables baseline never defines. Decoders accept both
    (ours reads EOBn up to r=14; tested with a hand-built stream)."""
    codes = c["codes_ac"]
    for by in range(c["bh"]):
        for bx in range(c["bw"]):
            zz = c["coefzz"][by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                av = abs(v) >> al
                if av == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = codes[0xF0]
                    bw.write(code, ln)
                    r -= 16
                s = av.bit_length()
                code, ln = codes[(r << 4) | s]
                bw.write(code, ln)
                mag = av if v > 0 else -av
                bw.write(mag if mag >= 0 else mag + (1 << s) - 1, s)
                r = 0
            if r > 0:
                code, ln = codes[0x00]  # EOB0
                bw.write(code, ln)


def _emit_ac_refine(bw, c, ss, se, al):
    """AC band, successive-approximation refinement (the encoder dual
    of `_ac_refine_block`): newly-significant coefficients code as
    (run<<4)|1 + sign, already-significant ones buffer a correction
    bit that flushes at the next symbol — exactly the order the
    decoder's advance loop consumes them in."""
    codes = c["codes_ac"]
    for by in range(c["bh"]):
        for bx in range(c["bw"]):
            zz = c["coefzz"][by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(64)]
            eobpos = ss - 1
            for k in range(ss, se + 1):
                if absv[k] == 1:
                    eobpos = k
            r = 0
            buffered: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    code, ln = codes[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for bit in buffered:
                        bw.write(bit, 1)
                    buffered = []
                if t > 1:  # already significant: buffer correction bit
                    buffered.append(t & 1)
                    continue
                code, ln = codes[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if int(zz[k]) > 0 else 0, 1)
                r = 0
                for bit in buffered:
                    bw.write(bit, 1)
                buffered = []
            if r > 0 or buffered:
                code, ln = codes[0x00]  # EOB0 folds the tail
                bw.write(code, ln)
                for bit in buffered:
                    bw.write(bit, 1)


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """uint8 (h, w, 3) RGB, (h, w, 1) or (h, w) gray → baseline
    sequential JFIF bytes. ``subsample=True`` emits 4:2:0 (box-mean
    chroma), else 4:4:4. ``restart_interval`` > 0 emits a DRI segment
    and RSTn markers every N MCUs (what a parallel decoder keys on —
    restart segments are the unit a 100 TB image pipeline could split
    entropy decode at; baseline only). ``progressive=True`` emits the
    SAME quantized coefficients as an SOF2 spectral-selection +
    successive-approximation scan script (DC first/refine, split AC
    bands at Al=1, AC refinements) — a lossless reorganization, so
    progressive and baseline payloads decode to identical pixels
    (pinned in tests). Non-uint8 input refuses (silent truncation
    would corrupt pixels with no error)."""
    if progressive and restart_interval:
        raise ValueError(
            "restart_interval is not supported by the progressive "
            "encoder (the decoder accepts progressive restarts)"
        )
    if img.dtype != np.uint8:
        raise ValueError(f"encode_jpeg needs uint8 pixels, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if h == 0 or w == 0 or nc not in (1, 3):
        raise ValueError(f"unsupported image shape {img.shape}")

    ql = _scaled_quant(_QUANT_LUMA, quality).reshape(8, 8).astype(np.float64)
    qc = _scaled_quant(_QUANT_CHROMA, quality).reshape(8, 8).astype(np.float64)

    if nc == 3:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if subsample:
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = (
                cbp[0::2, 0::2] + cbp[0::2, 1::2]
                + cbp[1::2, 0::2] + cbp[1::2, 1::2]
            ) / 4.0
            cr = (
                crp[0::2, 0::2] + crp[0::2, 1::2]
                + crp[1::2, 0::2] + crp[1::2, 1::2]
            ) / 4.0
            hy, vy = 2, 2
        else:
            hy, vy = 1, 1
        comps = [
            {"plane": y, "hv": (hy, vy), "qt": ql, "tq": 0, "dc": _DC_LUMA,
             "ac": _AC_LUMA, "td": 0},
            {"plane": cb, "hv": (1, 1), "qt": qc, "tq": 1, "dc": _DC_CHROMA,
             "ac": _AC_CHROMA, "td": 1},
            {"plane": cr, "hv": (1, 1), "qt": qc, "tq": 1, "dc": _DC_CHROMA,
             "ac": _AC_CHROMA, "td": 1},
        ]
    else:
        comps = [
            {"plane": img[:, :, 0].astype(np.float64), "hv": (1, 1),
             "qt": ql, "tq": 0, "dc": _DC_LUMA, "ac": _AC_LUMA, "td": 0},
        ]

    hmax = max(c["hv"][0] for c in comps)
    vmax = max(c["hv"][1] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        ch, cv = c["hv"]
        c["plane"] = _pad_to(c["plane"], mcuy * cv * 8, mcux * ch * 8)
        # pad up to the full MCU grid (edge replicate)
        need_h, need_w = mcuy * cv * 8, mcux * ch * 8
        p = c["plane"]
        if p.shape != (need_h, need_w):
            p = np.pad(
                p,
                ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
                mode="edge",
            )
        c["plane"] = p
        c["codes_dc"] = _canonical_codes(*c["dc"])
        c["codes_ac"] = _canonical_codes(*c["ac"])
        c["pred"] = 0

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    # DQT ships tables in zigzag order
    lz = _scaled_quant(_QUANT_LUMA, quality)[_ZIGZAG]
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in lz))
    if nc == 3:
        cz = _scaled_quant(_QUANT_CHROMA, quality)[_ZIGZAG]
        out += seg(0xDB, bytes([0x01]) + bytes(int(v) for v in cz))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, c in enumerate(comps):
        sof += struct.pack(
            ">BBB", i + 1, (c["hv"][0] << 4) | c["hv"][1], c["tq"]
        )
    out += seg(0xC2 if progressive else 0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if nc == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, vals) in tables:
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    if progressive:
        for i, c in enumerate(comps):
            c["coefzz"] = _quantize_blocks(c["plane"], c["qt"])
            ch, cv = c["hv"]
            # non-interleaved AC grid = ceil(sampled/8), NOT MCU-padded
            c["bh"] = -(-(-(-h * cv // vmax)) // 8)
            c["bw"] = -(-(-(-w * ch // hmax)) // 8)
            c["cid"] = i + 1
        all_ids = [(c["cid"], c["td"], c["td"]) for c in comps]

        def run_scan(header, emit, *args):
            wr = _BitWriter()
            emit(wr, *args)
            return header + wr.flush()

        # the classic script: DC first (Al=1) → AC bands at Al=1 →
        # DC refine → AC refinements, luma band split in two
        y0 = comps[0]
        out += run_scan(
            _sos_header(all_ids, 0, 0, 0, 1),
            _emit_dc_first, comps, mcux, mcuy, 1,
        )
        out += run_scan(
            _sos_header([(y0["cid"], 0, y0["td"])], 1, 5, 0, 1),
            _emit_ac_first, y0, 1, 5, 1,
        )
        for c in comps[1:]:
            out += run_scan(
                _sos_header([(c["cid"], 0, c["td"])], 1, 63, 0, 1),
                _emit_ac_first, c, 1, 63, 1,
            )
        out += run_scan(
            _sos_header([(y0["cid"], 0, y0["td"])], 6, 63, 0, 1),
            _emit_ac_first, y0, 6, 63, 1,
        )
        out += run_scan(
            _sos_header(all_ids, 0, 0, 1, 0),
            _emit_dc_refine, comps, mcux, mcuy, 0,
        )
        for c in comps:
            out += run_scan(
                _sos_header([(c["cid"], 0, c["td"])], 1, 63, 1, 0),
                _emit_ac_refine, c, 1, 63, 0,
            )
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    bw = _BitWriter()
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.align_marker(0xD0 + rst)
                rst = (rst + 1) & 7
                for c in comps:
                    c["pred"] = 0
            n_mcu += 1
            for c in comps:
                ch, cv = c["hv"]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        blk = c["plane"][y0 : y0 + 8, x0 : x0 + 8]
                        c["pred"] = _encode_block(
                            bw, blk, c["qt"], c["pred"],
                            c["codes_dc"], c["codes_ac"],
                        )
    sos = bytes([nc])
    for i, c in enumerate(comps):
        sos += bytes([i + 1, (c["td"] << 4) | c["td"]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
