"""MJPEG-in-MP4 (ISO base media file format) — pure stdlib/numpy, from
the public spec (ISO/IEC 14496-12): the same honest treatment round 7
gave AVI, applied to the MP4 container. The box tree (ftyp/mdat/moov →
trak → mdia → minf → stbl) is parsed for real — including the general
stsc chunk→sample mapping, co64 64-bit offsets, and 64-bit box sizes —
and every sample of a 'jpeg'-coded video track is a standalone JPEG
handed to :func:`jpeg.decode_jpeg` (MJPEG-in-MP4 is a real format:
camera timelapse and legacy QuickTime pipelines emit it). Tracks coded
H.264/HEVC/AV1 refuse with a clear ValueError naming the codec — the
DECODE gate for those stays declared until a codec library exists; the
CONTAINER is no longer the gap.

Contract: any malformed or unsupported payload raises
:class:`ValueError` — the single exception type
``extract_features(on_error='quarantine')`` and streaming ingest rely
on (fuzz-hardened in tests/test_codec_fuzz.py). Scale shape: container
parse + per-sample byte slicing is linear in payload bytes inside the
worker; frame extraction never decodes pixels.
"""

from __future__ import annotations

import struct

import numpy as np

from vectra_py_spark.operators.jpeg import decode_jpeg, encode_jpeg

__all__ = [
    "encode_mp4_mjpeg",
    "decode_mp4",
    "mp4_frame_payloads",
    "mp4_info",
    "synth_mp4",
]

_JPEG_FOURCCS = (b"jpeg", b"mjpa", b"mjpb", b"MJPG")


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B", version) + struct.pack(">I", flags)[1:] + body)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pre-encoded JPEG frame payloads → an ISO-BMFF MP4 with one
    'jpeg'-coded video track: ftyp + mdat (the concatenated frames) +
    moov (full sample tables — stts/stsc/stsz/stco). All samples land
    in one chunk; stco carries the absolute mdat payload offset."""
    if not frames:
        raise ValueError("encode_mp4_mjpeg needs at least one frame")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    for i, f in enumerate(frames):
        if f[:2] != b"\xff\xd8":
            raise ValueError(f"frame {i} is not a JPEG payload")
    n = len(frames)
    timescale = fps * 1000
    delta = 1000
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))
    chunk_offset = len(ftyp) + 8  # mdat payload starts after its header

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iHHII", 0x10000, 0, 0, 0, 0)
        + _MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16          # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + bytes(32)             # compressorname
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) over a box run; handles
    64-bit largesize and size-0 (to end-of-enclosure)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("MP4 largesize box truncated")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if size != 0 and (size < 8 or box_end > end):
            raise ValueError("MP4 box extends past its parent")
        yield fourcc, body, box_end
        if box_end <= pos:
            raise ValueError("MP4 box makes no forward progress")
        pos = box_end


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    for fc, b, e in _walk(data, pos, end):
        if fc == fourcc:
            yield b, e


def _full_body(data: bytes, body: int, end: int) -> int:
    """Skip a FullBox's version+flags; returns the payload start."""
    if body + 4 > end:
        raise ValueError("MP4 full box truncated")
    return body + 4


def _parse_video_track(payload: bytes):
    moovs = list(_find(payload, 0, len(payload), b"moov"))
    if not moovs:
        raise ValueError("MP4 missing moov box")
    moov_b, moov_e = moovs[0]
    for trak_b, trak_e in _find(payload, moov_b, moov_e, b"trak"):
        for mdia_b, mdia_e in _find(payload, trak_b, trak_e, b"mdia"):
            handler = None
            for h_b, h_e in _find(payload, mdia_b, mdia_e, b"hdlr"):
                p = _full_body(payload, h_b, h_e)
                handler = payload[p + 4 : p + 8]
            if handler != b"vide":
                continue
            for minf_b, minf_e in _find(payload, mdia_b, mdia_e, b"minf"):
                for stbl_b, stbl_e in _find(payload, minf_b, minf_e, b"stbl"):
                    return _parse_stbl(payload, stbl_b, stbl_e)
    raise ValueError("MP4 has no video ('vide') track")


def _parse_stbl(payload: bytes, b: int, e: int):
    fourcc = None
    width = height = None
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    stsc_rows: list[tuple[int, int]] = []
    for fc, cb, ce in _walk(payload, b, e):
        if fc == b"stsd":
            p = _full_body(payload, cb, ce)
            (count,) = struct.unpack_from(">I", payload, p)
            if count < 1:
                raise ValueError("MP4 stsd has no sample entries")
            entry_b = p + 4
            fourcc = payload[entry_b + 4 : entry_b + 8]
            if entry_b + 36 <= ce:
                width, height = struct.unpack_from(">HH", payload, entry_b + 32)
        elif fc == b"stsz":
            p = _full_body(payload, cb, ce)
            uniform, count = struct.unpack_from(">II", payload, p)
            if uniform:
                sizes = [uniform] * count
            else:
                if p + 8 + 4 * count > ce:
                    raise ValueError("MP4 stsz table truncated")
                sizes = list(
                    struct.unpack_from(f">{count}I", payload, p + 8)
                )
        elif fc in (b"stco", b"co64"):
            p = _full_body(payload, cb, ce)
            (count,) = struct.unpack_from(">I", payload, p)
            fmt, w = (">%dI", 4) if fc == b"stco" else (">%dQ", 8)
            if p + 4 + w * count > ce:
                raise ValueError("MP4 chunk-offset table truncated")
            chunk_offsets = list(
                struct.unpack_from(fmt % count, payload, p + 4)
            )
        elif fc == b"stsc":
            p = _full_body(payload, cb, ce)
            (count,) = struct.unpack_from(">I", payload, p)
            if p + 4 + 12 * count > ce:
                raise ValueError("MP4 stsc table truncated")
            for i in range(count):
                first, spc, _desc = struct.unpack_from(
                    ">III", payload, p + 4 + 12 * i
                )
                stsc_rows.append((first, spc))
    if fourcc is None:
        raise ValueError("MP4 video track missing stsd")
    if fourcc not in _JPEG_FOURCCS:
        raise ValueError(
            f"unsupported MP4 video codec {fourcc!r} — only MJPEG "
            "('jpeg' sample entries) supported without a codec library"
        )
    if not sizes or not chunk_offsets or not stsc_rows:
        raise ValueError("MP4 video track missing sample tables")
    # general stsc walk: map every sample to its absolute offset
    offsets: list[int] = []
    si = 0
    n_chunks = len(chunk_offsets)
    for ri, (first, spc) in enumerate(stsc_rows):
        last = (
            stsc_rows[ri + 1][0] - 1 if ri + 1 < len(stsc_rows) else n_chunks
        )
        if first < 1 or last > n_chunks or first > last:
            raise ValueError("MP4 stsc chunk run out of range")
        for chunk in range(first, last + 1):
            off = chunk_offsets[chunk - 1]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                offsets.append(off)
                off += sizes[si]
                si += 1
    if si < len(sizes):
        raise ValueError("MP4 stsc covers fewer samples than stsz")
    frames = []
    for off, size in zip(offsets, sizes):
        frame = payload[off : off + size]
        if len(frame) != size:
            raise ValueError("MP4 sample extends past the payload")
        if frame[:2] != b"\xff\xd8":
            raise ValueError("MP4 MJPEG sample is not a JPEG payload")
        frames.append(frame)
    return width, height, frames


def mp4_info(payload: bytes) -> dict:
    """Container-level probe without pixel decode."""
    try:
        if payload[4:8] != b"ftyp":
            raise ValueError(f"not an MP4 payload: {payload[:8]!r}")
        width, height, frames = _parse_video_track(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed MP4 payload: {exc}") from exc
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frame_bytes": [len(f) for f in frames],
    }


def mp4_frame_payloads(payload: bytes) -> list[bytes]:
    """Byte-exact JPEG payloads of every video sample (no pixel
    decode)."""
    try:
        if payload[4:8] != b"ftyp":
            raise ValueError(f"not an MP4 payload: {payload[:8]!r}")
        return _parse_video_track(payload)[2]
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed MP4 payload: {exc}") from exc


def decode_mp4(payload: bytes) -> np.ndarray:
    """Full pixel decode: every MJPEG sample through
    :func:`jpeg.decode_jpeg` → uint8 array (n_frames, h, w, c)."""
    frames = mp4_frame_payloads(payload)
    imgs = [decode_jpeg(f) for f in frames]
    if any(im.shape != imgs[0].shape for im in imgs):
        raise ValueError("MP4 frames decode to differing shapes")
    return np.stack(imgs)


def synth_mp4(
    n_frames: int = 5, width: int = 24, height: int = 16, quality: int = 85
) -> bytes:
    """Generate a real MJPEG MP4 (same ramp pattern as synth_avi —
    valid input for ANY MJPEG-capable MP4 reader)."""
    frames = []
    for i in range(n_frames):
        v = (40 + i * 35) % 256
        frames.append(
            encode_jpeg(np.full((height, width), v, np.uint8), quality=quality)
        )
    return encode_mp4_mjpeg(frames, width, height)
