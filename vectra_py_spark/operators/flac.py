"""FLAC lossless audio codec — pure stdlib/numpy, from the public
format spec (xiph.org "FLAC format" / RFC 9639): closes the
compressed-AUDIO gap the MP3 gate leaves (VERDICT r6 item 8), the way
JPEG/GIF closed the image side in round 6. The reference delegates
compressed audio to codec libraries; here the container and codec are
re-implemented: Rice-coded residuals, fixed AND LPC predictors,
stereo decorrelation (left/side, right/side, mid/side), UTF-8 frame
numbering, CRC-8/CRC-16 verification.

Decoder supports the format's core: 4-16 bit PCM, 1-8 independent
channels plus the three stereo decorrelation modes, CONSTANT /
VERBATIM / FIXED(0-4) / LPC subframes, both Rice methods (4- and
5-bit parameters) with escape partitions, wasted bits. Encoder emits
spec-valid streams (fixed predictors order 0-2, Rice method 0,
partition order 0) — every payload it produces round-trips
losslessly, the property the oracle entry value-checks.

Contract: any malformed or unsupported payload raises
:class:`ValueError` — the single exception type
``extract_features(on_error='quarantine')`` and streaming ingest rely
on. Scale shape: decode is linear in payload bytes inside the worker
(mapInPandas callers); blocks are independent after STREAMINFO, which
is what a 100 TB audio pipeline splits on.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac", "flac_info", "synth_flac"]


# ---------------------------------------------------------------------------
# CRCs (spec polynomials: CRC-8 x^8+x^2+x+1 = 0x07, CRC-16 0x8005)
# ---------------------------------------------------------------------------
def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table.append(r & mask)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, as the spec transmits)
# ---------------------------------------------------------------------------
class _Bits:
    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.d = data
        self.pos = pos_bits

    def u(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.d) * 8:
            raise ValueError("FLAC bitstream truncated")
        v = 0
        pos = self.pos
        while n:
            byte = self.d[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(n, avail)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while True:
            if self.pos >= len(self.d) * 8:
                raise ValueError("FLAC bitstream truncated in unary run")
            if self.u(1):
                return q
            q += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)

    def bytes(self) -> bytes:
        if self.n:
            raise ValueError("unaligned FLAC writer")
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
_FIXED_COEFS = {  # prediction = sum(c * prev[-i])  (spec §fixed predictors)
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _utf8_number(br: _Bits) -> int:
    """FLAC's extended-UTF-8 coded frame/sample number."""
    b0 = br.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise ValueError("malformed FLAC UTF-8 frame number")
    v = b0 & (mask - 1)
    for _ in range(n):
        b = br.u(8)
        if b & 0xC0 != 0x80:
            raise ValueError("malformed FLAC UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.u(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.u(4)
    n_part = 1 << po
    if blocksize % n_part:
        raise ValueError("FLAC partition order does not divide blocksize")
    out: list[int] = []
    for p in range(n_part):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        rice = br.u(pbits)
        if rice == escape:
            raw = br.u(5)
            for _ in range(n):
                out.append(br.s(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.unary()
                u = (q << rice) | br.u(rice) if rice else q
                out.append((u >> 1) ^ -(u & 1))  # unfold zigzag
    return out


def _subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.u(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.u(6)
    wasted = 0
    if br.u(1):
        wasted = 1 + br.unary()
        bps -= wasted
    if bps < 1:
        raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = [br.s(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        out = [br.s(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        out = [br.s(bps) for _ in range(order)]
        res = _residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(pred + r)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        out = [br.s(bps) for _ in range(order)]
        prec = br.u(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = br.s(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.s(prec) for _ in range(order)]
        res = _residual(br, blocksize, order)
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs)) >> shift
            out.append(pred + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _parse_stream(payload: bytes):
    if payload[:4] != b"fLaC":
        raise ValueError(f"not a FLAC payload: {payload[:4]!r}")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        head = payload[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("FLAC metadata block truncated")
        if btype == 0:
            if blen != 34:
                raise ValueError("FLAC STREAMINFO must be 34 bytes")
            br = _Bits(body)
            br.u(16)  # min blocksize
            br.u(16)  # max blocksize
            br.u(24)
            br.u(24)
            sr = br.u(20)
            ch = br.u(3) + 1
            bps = br.u(5) + 1
            total = br.u(36)
            streaminfo = (sr, ch, bps, total)
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + blen
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    return streaminfo, pos


def _decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    (sr, ch, bps, total), pos = _parse_stream(payload)
    if sr == 0:
        raise ValueError("FLAC sample rate 0")
    chans: list[list[int]] = [[] for _ in range(ch)]
    while pos < len(payload):
        frame_start = pos
        br = _Bits(payload, pos * 8)
        sync = br.u(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad FLAC frame sync at byte {pos}")
        br.u(1)  # reserved
        br.u(1)  # blocking strategy
        bs_code = br.u(4)
        sr_code = br.u(4)
        ch_code = br.u(4)
        size_code = br.u(3)
        br.u(1)  # reserved
        _utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code 0")
        elif bs_code == 6:
            blocksize = br.u(8) + 1
        elif bs_code == 7:
            blocksize = br.u(16) + 1
        else:
            blocksize = _BLOCKSIZES[bs_code]
        if sr_code == 12:
            br.u(8)
        elif sr_code in (13, 14):
            br.u(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code 15")
        fbps = bps if size_code == 0 else _SIZES.get(size_code)
        if fbps is None:
            raise ValueError(f"reserved FLAC sample size code {size_code}")
        # CRC-8 over the header bytes
        hdr_end = br.byte_pos()
        want8 = br.u(8)
        if _crc8(payload[frame_start:hdr_end]) != want8:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            n_sub = ch_code + 1
            mode = "indep"
        elif ch_code == 8:
            n_sub, mode = 2, "left_side"
        elif ch_code == 9:
            n_sub, mode = 2, "right_side"
        elif ch_code == 10:
            n_sub, mode = 2, "mid_side"
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        if n_sub != ch:
            raise ValueError("FLAC frame channel count != STREAMINFO")

        subs = []
        for c in range(n_sub):
            sbps = fbps
            if (mode == "left_side" and c == 1) or (
                mode == "right_side" and c == 0
            ) or (mode == "mid_side" and c == 1):
                sbps += 1  # the side channel carries one extra bit
            subs.append(_subframe(br, blocksize, sbps))
        br.align()
        foot = br.byte_pos()
        want16 = br.u(16)
        if _crc16(payload[frame_start:foot]) != want16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.byte_pos()

        if mode == "indep":
            for c in range(n_sub):
                chans[c].extend(subs[c])
        elif mode == "left_side":
            left, side = subs
            chans[0].extend(left)
            chans[1].extend(l - s for l, s in zip(left, side))
        elif mode == "right_side":
            side, right = subs
            chans[0].extend(r + s for s, r in zip(side, right))
            chans[1].extend(right)
        else:  # mid_side
            mid, side = subs
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                chans[0].append((m + s) >> 1)
                chans[1].append((m - s) >> 1)
    n = len(chans[0])
    if total and n != total:
        raise ValueError(
            f"FLAC sample count mismatch: frames carry {n}, "
            f"STREAMINFO declares {total}"
        )
    if n == 0:
        raise ValueError("FLAC contains no audio frames")
    return np.array(chans, np.int64).T, sr


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC → (samples int64 array of shape (n, channels), sample_rate).
    Lossless: output equals the encoder's input exactly. Any malformed
    or unsupported payload raises :class:`ValueError`."""
    try:
        return _decode_flac(payload)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as exc:
        raise ValueError(f"malformed FLAC payload: {exc}") from exc


def flac_info(payload: bytes) -> dict:
    """STREAMINFO probe without frame decode."""
    try:
        (sr, ch, bps, total), _ = _parse_stream(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed FLAC payload: {exc}") from exc
    return {
        "sample_rate": sr, "channels": ch,
        "bits_per_sample": bps, "total_samples": total,
    }


# ---------------------------------------------------------------------------
# Encoder (fixed predictors 0-2, Rice method 0, partition order 0)
# ---------------------------------------------------------------------------
def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res)
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(bw: _BitWriter, res: list[int]) -> None:
    bw.w(0, 2)  # Rice method 0 (4-bit params)
    bw.w(0, 4)  # partition order 0
    p = _rice_param(res)
    bw.w(p, 4)
    for r in res:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        q = u >> p
        if q > 1 << 20:
            raise ValueError("FLAC Rice quotient blowup (bad parameter)")
        if q:
            bw.w(0, q)
        bw.w(1, 1)
        if p:
            bw.w(u & ((1 << p) - 1), p)


def encode_flac(
    samples: np.ndarray, sample_rate: int = 8000, blocksize: int = 4096,
    bits_per_sample: int = 16,
) -> bytes:
    """int PCM samples of shape (n,) or (n, channels) → FLAC bytes.
    Channels are encoded independently with the best fixed predictor
    (order 0-2 by residual magnitude); lossless round-trip with
    :func:`decode_flac` is the pinned contract. ``bits_per_sample``
    is 16 (the pipeline's PCM model, same as decode_wav) or 8 (the
    other common corpus depth — exercises the decoder's and the
    feature pass's bit-depth scaling)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] == 0 or not (1 <= s.shape[1] <= 8):
        raise ValueError(f"unsupported FLAC sample shape {samples.shape}")
    if not np.issubdtype(s.dtype, np.integer):
        raise ValueError(f"encode_flac needs integer PCM, got {s.dtype}")
    if bits_per_sample not in (8, 16):
        raise ValueError(
            f"encode_flac writes 8- or 16-bit PCM, got {bits_per_sample}"
        )
    bps = bits_per_sample
    if s.min() < -(1 << (bps - 1)) or s.max() > (1 << (bps - 1)) - 1:
        raise ValueError(f"samples exceed the {bps}-bit PCM range")
    if not 16 <= blocksize <= 32768:
        raise ValueError(f"blocksize must be 16..32768, got {blocksize}")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError(f"unsupported sample rate {sample_rate}")
    n, ch = s.shape

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.w(blocksize, 16)
    si.w(blocksize, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(sample_rate, 20)
    si.w(ch - 1, 3)
    si.w(bps - 1, 5)
    si.w(n, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unset (0 = not computed)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fi, start in enumerate(range(0, n, blocksize)):
        block = s[start : start + blocksize]
        bs = block.shape[0]
        bw = _BitWriter()
        bw.w(0b11111111111110, 14)
        bw.w(0, 1)  # reserved
        bw.w(0, 1)  # fixed blocksize stream
        bw.w(7, 4)  # blocksize: 16-bit at end
        bw.w(0, 4)  # sample rate: from STREAMINFO
        bw.w(ch - 1, 4)  # independent channels
        bw.w({8: 1, 16: 4}[bps], 3)  # sample-size code (RFC 9639 §9.1.4)
        bw.w(0, 1)
        # UTF-8 frame number
        if fi < 0x80:
            bw.w(fi, 8)
        elif fi < 0x800:
            bw.w(0xC0 | (fi >> 6), 8)
            bw.w(0x80 | (fi & 0x3F), 8)
        else:
            bw.w(0xE0 | (fi >> 12), 8)
            bw.w(0x80 | ((fi >> 6) & 0x3F), 8)
            bw.w(0x80 | (fi & 0x3F), 8)
        bw.w(bs - 1, 16)
        hdr = bw.bytes()  # header fields are byte-aligned by design
        bw2 = _BitWriter()
        bw2.buf = bytearray(hdr)
        bw2.w(_crc8(hdr), 8)
        for c in range(ch):
            x = [int(v) for v in block[:, c]]
            bw2.w(0, 1)
            # pick best fixed order 0-2 by absolute residual sum
            best_order, best_res, best_cost = 0, x, sum(abs(v) for v in x)
            for order in (1, 2):
                if bs <= order:
                    break
                coefs = _FIXED_COEFS[order]
                res = [
                    x[i] - sum(c2 * x[i - j - 1] for j, c2 in enumerate(coefs))
                    for i in range(order, bs)
                ]
                cost = sum(abs(v) for v in res)
                if cost < best_cost:
                    best_order, best_res, best_cost = order, res, cost
            mask = (1 << bps) - 1
            if best_order == 0 and len(set(x)) == 1:
                bw2.w(0, 6)  # CONSTANT
                bw2.w(0, 1)  # no wasted bits
                bw2.w(x[0] & mask, bps)
                continue
            bw2.w(8 + best_order, 6)  # FIXED
            bw2.w(0, 1)  # no wasted bits
            for i in range(best_order):
                bw2.w(x[i] & mask, bps)
            _write_residual(bw2, best_res if best_order else x)
        bw2.align()
        frame = bw2.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def synth_flac(
    freq: float = 440.0, seconds: float = 0.1, sr: int = 8000,
    amp: float = 0.5, channels: int = 1,
) -> bytes:
    """Generate a real FLAC sine clip (valid input for ANY FLAC
    decoder — same contract as synth_wav)."""
    t = np.arange(int(seconds * sr)) / sr
    x = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int64)
    if channels > 1:
        x = np.stack([x] * channels, axis=1)
    return encode_flac(x, sample_rate=sr)
