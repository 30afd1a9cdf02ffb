"""MP3 (MPEG-1/2/2.5 audio) container-level probe — pure stdlib, from
the public frame-header spec (ISO/IEC 11172-3): the curation-honest
treatment of the one media format whose DECODE stays gated (a Layer III
decoder needs the hybrid filterbank + Huffman tables a codec library
provides; the gate in multimodal.py is unchanged). What a 100 TB crawl
pipeline needs BEFORE decoding is metadata: is this really an MP3, how
long is it, what bitrate/sample-rate, CBR or VBR — all derivable from
the frame headers alone. This module walks every frame (ID3v2/ID3v1
aware, Xing/Info VBR header detected), validates the chain, and
reports duration/bitrate statistics without touching a single PCM
sample.

Contract: malformed payloads raise :class:`ValueError` (fuzz-hardened
in tests/test_codec_fuzz.py). Scale: linear single pass over payload
bytes inside the worker.
"""

from __future__ import annotations

import struct

__all__ = ["mp3_info", "synth_mp3"]

# bitrate kbps tables, index 1..14 (0 = free, 15 = bad) — ISO 11172-3
_BITRATE = {
    # (version_key, layer): [index 1..14]
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLERATE = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
               "2.5": [11025, 12000, 8000]}


def _id3v2_size(payload: bytes) -> int:
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    if any(b & 0x80 for b in payload[6:10]):
        raise ValueError("malformed ID3v2 syncsafe size")
    size = (
        (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
    )
    footer = 10 if payload[5] & 0x10 else 0
    return 10 + size + footer


def _parse_header(b: bytes, pos: int):
    """Frame header at pos → (version, layer, bitrate_kbps, samplerate,
    frame_bytes, samples_per_frame) or None if not a valid sync."""
    if pos + 4 > len(b):
        return None
    h = struct.unpack_from(">I", b, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_code = (h >> 19) & 3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_code)
    layer = {1: 3, 2: 2, 3: 1}.get((h >> 17) & 3)
    if version is None or layer is None:
        return None
    br_idx = (h >> 12) & 15
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vkey = "1" if version == "1" else "2"
    bitrate = _BITRATE[(vkey, layer)][br_idx - 1] * 1000
    sr = _SAMPLERATE[version][sr_idx]
    padding = (h >> 9) & 1
    if layer == 1:
        spf = 384
        frame = (12 * bitrate // sr + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        frame = spf // 8 * bitrate // sr + padding
    if frame <= 4:
        return None
    return version, layer, bitrate, sr, frame, spf


def mp3_info(payload: bytes) -> dict:
    """Walk the full frame chain: version/layer, sample rate, frame
    count, exact duration, mean bitrate, CBR/VBR, Xing/Info presence.
    At least two chained valid frames are required (a lone 0xFFF sync
    in random bytes is not an MP3)."""
    if not payload:
        raise ValueError("not an MP3 payload: empty")
    pos = _id3v2_size(payload)
    end = len(payload)
    if end >= 128 and payload[-128:-125] == b"TAG":  # ID3v1 trailer
        end -= 128
    first = _parse_header(payload, pos)
    if first is None:
        raise ValueError(
            f"not an MP3 payload: no frame sync at offset {pos}"
        )
    version, layer, _, sr, _, spf = first
    n_frames = 0
    bitrates = []
    xing = False
    while pos < end:
        h = _parse_header(payload, pos)
        if h is None:
            raise ValueError(
                f"MP3 frame chain broken at byte {pos} "
                f"(frame {n_frames})"
            )
        v2, l2, br, sr2, frame, _ = h
        if (v2, l2, sr2) != (version, layer, sr):
            raise ValueError("MP3 frame parameters change mid-stream")
        if pos + frame > end:
            raise ValueError("MP3 final frame truncated")
        if n_frames == 0:
            body = payload[pos + 4 : pos + frame]
            xing = b"Xing" in body or b"Info" in body or b"VBRI" in body
        bitrates.append(br)
        n_frames += 1
        pos += frame
    duration = n_frames * spf / sr
    return {
        "version": version,
        "layer": layer,
        "sample_rate": sr,
        "n_frames": n_frames,
        "duration_s": round(duration, 6),
        "bitrate_mean": int(sum(bitrates) / len(bitrates)),
        "cbr": len(set(bitrates)) == 1,
        "vbr_header": xing,
    }


def synth_mp3(
    n_frames: int = 20, bitrate_kbps: int = 128, sr: int = 44100,
    vbr: bool = False,
) -> bytes:
    """Generate a structurally valid MPEG-1 Layer III frame chain
    (headers + zero payload — enough for ANY header-walking probe;
    actual audio content would need an encoder library). ``vbr=True``
    alternates bitrates to exercise the VBR statistics path."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}.get(sr)
    if sr_idx is None:
        raise ValueError(f"unsupported MPEG-1 sample rate {sr}")
    table = _BITRATE[("1", 3)]
    out = bytearray()
    rates = [bitrate_kbps] if not vbr else [96, 128, 160, 192]
    for i in range(n_frames):
        kbps = rates[i % len(rates)]
        if kbps not in table:
            raise ValueError(f"unsupported Layer III bitrate {kbps}")
        br_idx = table.index(kbps) + 1
        h = (
            (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)  # V1 L3, no CRC
            | (br_idx << 12) | (sr_idx << 10) | (0 << 9) | (3 << 6)  # mono
        )
        frame_len = 144 * kbps * 1000 // sr
        out += struct.pack(">I", h) + bytes(frame_len - 4)
    return bytes(out)
