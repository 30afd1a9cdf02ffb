"""GIF87a/89a codec with zero codec dependencies.

Decoder: logical-screen + color-table parse, full variable-width LZW
decompression (LSB-first bit packing, CLEAR/EOI handling, 4096-entry
dictionary), local color tables, interlace de-interleaving (the four
standard passes), Graphic Control Extension transparency and disposal
methods 0–3, multi-frame compositing onto the logical screen → uint8
array of shape (n_frames, h, w, 3). ANY malformed payload (truncated
header, bad LZW code, missing trailer, oversized frame rect) refuses
with :class:`ValueError` — the same single-exception contract as the
PNG/BMP/JPEG codecs in this package.

Encoder: the inverse — real LZW compression (dictionary-based, emits
CLEAR on dictionary overflow), exact palette built from the frames'
unique colors (≤256 — quantization is an upstream concern), optional
animation (Graphic Control delay + Netscape looping extension).

Why GIF matters to a 100 TB multimodal pipeline: it is the one
ubiquitous MULTI-FRAME format decodable with pure stdlib bit twiddling,
which makes the video-style operators (frame sampling, per-frame
features) testable against REAL frames rather than byte-slice stand-ins
— see :func:`vectra_py_spark.operators.multimodal.sample_frames`'s
deterministic slicing versus :func:`decode_gif`'s actual frames. Like
:mod:`.jpeg`, this is beyond-reference pipeline surface (the reference
engine is text-only — SURVEY.md §2), held to the same contracts.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]

_MAX_CODE = 4096


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------
def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable-width codes (LSB-first), CLEAR resets
    the dictionary, EOI terminates. Returns exactly ``n_pixels`` color
    indices (trailing surplus is a spec violation → ValueError)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0

    # dictionary as (prefix_code, last_byte); roots are implicit
    prefix = np.full(_MAX_CODE, -1, np.int32)
    suffix = np.zeros(_MAX_CODE, np.uint8)
    length = np.ones(_MAX_CODE, np.int32)
    for c in range(clear):
        suffix[c] = c

    def reset():
        return clear + 2, min_code_size + 1

    next_code, width = reset()
    acc = 0
    n_bits = 0
    pos = 0
    prev = -1
    while True:
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width

        if code == clear:
            next_code, width = reset()
            prev = -1
            continue
        if code == eoi:
            break
        if code >= next_code or (code > eoi and prefix[code] == -1 and code >= clear):
            # the only legal just-out-of-range code is next_code itself
            # (the KwKwK case), and only when a previous code exists
            if code != next_code or prev < 0:
                raise ValueError(f"invalid GIF LZW code {code}")
            entry_len = length[prev] + 1
            first = _first_byte(prev, prefix, suffix)
            seq = _expand(prev, prefix, suffix, length) + bytes([first])
        else:
            entry_len = length[code]
            seq = _expand(code, prefix, suffix, length)
            first = seq[0]
        if n_out + len(seq) > n_pixels:
            raise ValueError("GIF LZW produced more pixels than the frame holds")
        out[n_out : n_out + len(seq)] = np.frombuffer(seq, np.uint8)
        n_out += len(seq)
        if prev >= 0 and next_code < _MAX_CODE:
            prefix[next_code] = prev
            suffix[next_code] = first
            length[next_code] = length[prev] + 1
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
        if n_out == n_pixels:
            break
    if n_out != n_pixels:
        raise ValueError(
            f"GIF frame decoded {n_out} of {n_pixels} expected pixels"
        )
    return out


def _expand(code: int, prefix, suffix, length) -> bytes:
    buf = bytearray(length[code])
    i = length[code] - 1
    c = code
    while c >= 0:
        buf[i] = suffix[c]
        c = prefix[c]
        i -= 1
    return bytes(buf)


def _first_byte(code: int, prefix, suffix) -> int:
    c = code
    while prefix[c] >= 0:
        c = prefix[c]
    return int(suffix[c])


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real dictionary LZW compression (GIF variant): emits CLEAR up
    front and again on dictionary overflow, EOI at the end."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    n_bits = 0

    def emit(code: int, width: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table: dict[bytes, int] = {bytes([c]): c for c in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for px in indices.tobytes():
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < _MAX_CODE:
            table[wk] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([c]): c for c in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → uint8 frames of shape (n_frames, h, w, 3), composited
    onto the logical screen per each frame's disposal method. Any
    malformed payload raises :class:`ValueError`."""
    try:
        return _decode_gif(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed GIF payload: {exc}") from exc


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload: {payload[:6]!r}")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if w == 0 or h == 0:
        raise ValueError(f"malformed GIF dimensions ({w}x{h})")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    prev_canvas = None

    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated before trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control
                size = payload[pos]
                if size != 4:
                    raise ValueError("malformed GIF graphic control block")
                flags = payload[pos + 1]
                disposal = (flags >> 2) & 7
                transparent = payload[pos + 4] if flags & 1 else -1
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("unterminated GIF graphic control")
                pos += 1
            else:  # skip sub-blocks (app/comment/plain-text)
                while True:
                    size = payload[pos]
                    pos += 1
                    if size == 0:
                        break
                    pos += size
        elif block == 0x2C:  # image descriptor
            fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
                raise ValueError(
                    f"GIF frame rect ({fx},{fy},{fw},{fh}) outside "
                    f"{w}x{h} logical screen"
                )
            ct = gct
            if fpacked & 0x80:
                n = 2 << (fpacked & 7)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while True:
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                data += payload[pos : pos + size]
                if len(payload) < pos + size:
                    raise ValueError("GIF image data sub-block truncated")
                pos += size
            idx = _lzw_decode(bytes(data), min_code, fw * fh).reshape(fh, fw)
            if fpacked & 0x40:  # interlaced: reorder rows
                de = np.empty_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, fh, step)
                    for r in rows:
                        de[r] = idx[src]
                        src += 1
                idx = de
            if int(idx.max()) >= len(ct):
                raise ValueError("GIF pixel index outside color table")

            if disposal == 3:
                prev_canvas = canvas.copy()
            region = canvas[fy : fy + fh, fx : fx + fw]
            rgb = ct[idx]
            if transparent >= 0:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            frames.append(canvas.copy())
            if disposal == 2:  # restore region to background
                # GIF89a: the background color index refers to the GLOBAL
                # color table — never a frame's local table.
                bg_rgb = gct[bg] if (gct is not None and bg < len(gct)) else 0
                canvas[fy : fy + fh, fx : fx + fw] = bg_rgb
            elif disposal == 3 and prev_canvas is not None:
                canvas = prev_canvas
            disposal = 0
            transparent = -1
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
def encode_gif(
    frames: np.ndarray, delay_cs: int = 10, loop: bool = True
) -> bytes:
    """uint8 frames of shape (n, h, w, 3) — or a single (h, w, 3)
    image — → GIF89a bytes with real LZW compression. The palette is
    built exactly from the frames' unique colors and must fit in 256
    entries (palette quantization is an upstream transform, same
    contract as encode_png's bit depths). Animated payloads carry the
    Graphic Control delay and a Netscape loop extension."""
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(
            f"encode_gif needs uint8 (n, h, w, 3) frames, got "
            f"{frames.dtype} {frames.shape}"
        )
    n, h, w, _ = frames.shape
    if n == 0 or h == 0 or w == 0:
        raise ValueError(f"unsupported GIF frame shape {frames.shape}")
    flat = frames.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"encode_gif palette would need {len(palette)} colors (max "
            "256) — quantize upstream"
        )
    # pad palette to a power of two ≥ 4 (min LZW code size is 2)
    bits = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    size = 1 << bits
    table = np.zeros((size, 3), np.uint8)
    table[: len(palette)] = palette
    idx_frames = inverse.astype(np.uint8).reshape(n, h, w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    if n > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(n):
        if n > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(bits)
        data = _lzw_encode(idx_frames[f].reshape(-1), bits)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
