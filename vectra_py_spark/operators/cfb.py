"""MS-CFB (Compound File Binary / OLE2) container — pure stdlib, from
the public [MS-CFB] specification. This is the container format of
legacy Office (.doc/.ppt/.xls) and of password-protected OOXML; until
now every OLE payload refused at the office gate. The reader walks
the real structures — DIFAT (header entries + chained DIFAT sectors),
FAT sector chains, the directory tree, and the miniFAT/mini-stream
layer for streams under the 4096-byte cutoff — and the writer emits
spec-valid containers (regular AND mini streams) so the .doc
round-trip fixtures exercise both layers, the same
independent-path discipline as the PDF/FLAC codecs.

Contract: malformed payloads raise :class:`ValueError` only
(fuzz-pinned); chain walks are step-bounded so crafted cyclic FATs
terminate instead of spinning.
"""

from __future__ import annotations

import struct

__all__ = ["CfbReader", "encode_cfb", "OLE_MAGIC"]

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_NOSTREAM = 0xFFFFFFFF


class CfbReader:
    """Directory of streams over one OLE payload."""

    def __init__(self, payload: bytes) -> None:
        if payload[:8] != OLE_MAGIC:
            raise ValueError(f"not an OLE payload: {payload[:8]!r}")
        if len(payload) < 512:
            raise ValueError("OLE header truncated")
        self.d = payload
        (sector_shift,) = struct.unpack_from("<H", payload, 0x1E)
        (mini_shift,) = struct.unpack_from("<H", payload, 0x20)
        if sector_shift not in (9, 12) or mini_shift != 6:
            raise ValueError(
                f"bad OLE sector shifts ({sector_shift}/{mini_shift})"
            )
        self.ssz = 1 << sector_shift
        self.msz = 1 << mini_shift
        (self.n_fat,) = struct.unpack_from("<I", payload, 0x2C)
        (self.dir_start,) = struct.unpack_from("<I", payload, 0x30)
        (self.mini_cutoff,) = struct.unpack_from("<I", payload, 0x38)
        (self.minifat_start,) = struct.unpack_from("<I", payload, 0x3C)
        (self.n_minifat,) = struct.unpack_from("<I", payload, 0x40)
        (self.difat_start,) = struct.unpack_from("<I", payload, 0x44)
        (self.n_difat,) = struct.unpack_from("<I", payload, 0x48)
        self._load_fat()
        self._load_dir()
        self._load_minifat()

    # -- sector plumbing ------------------------------------------------
    def _sector(self, n: int) -> bytes:
        off = (n + 1) * self.ssz
        s = self.d[off : off + self.ssz]
        if len(s) < self.ssz:
            raise ValueError(f"OLE sector {n} out of range")
        return s

    def _load_fat(self) -> None:
        difat: list[int] = list(
            struct.unpack_from("<109I", self.d, 0x4C)
        )
        sec = self.difat_start
        per = self.ssz // 4 - 1
        for _ in range(min(self.n_difat, 1 << 16)):
            if sec in (_ENDOFCHAIN, _FREESECT):
                break
            raw = self._sector(sec)
            vals = struct.unpack(f"<{self.ssz // 4}I", raw)
            difat.extend(vals[:per])
            sec = vals[per]
        self.fat: list[int] = []
        n_loaded = 0
        for fs in difat:
            if fs in (_FREESECT, _ENDOFCHAIN):
                continue
            if n_loaded >= self.n_fat:
                break
            self.fat.extend(
                struct.unpack(f"<{self.ssz // 4}I", self._sector(fs))
            )
            n_loaded += 1
        if not self.fat:
            raise ValueError("OLE file with no FAT sectors")

    def _chain(self, start: int, fat: list[int]) -> list[int]:
        out: list[int] = []
        sec = start
        limit = len(fat) + 2
        while sec not in (_ENDOFCHAIN, _FREESECT):
            if sec >= len(fat) or len(out) > limit:
                raise ValueError("OLE sector chain runs out of the FAT")
            out.append(sec)
            sec = fat[sec]
        return out

    def _read_chain(self, start: int) -> bytes:
        return b"".join(self._sector(s) for s in self._chain(start, self.fat))

    # -- directory -------------------------------------------------------
    def _load_dir(self) -> None:
        raw = self._read_chain(self.dir_start)
        self.entries: list[dict] = []
        for off in range(0, len(raw), 128):
            e = raw[off : off + 128]
            if len(e) < 128:
                break
            (nlen,) = struct.unpack_from("<H", e, 64)
            if not 0 < nlen <= 64:
                self.entries.append({"type": 0, "name": ""})
                continue
            name = e[: nlen - 2].decode("utf-16-le", "replace")
            etype = e[66]
            (start,) = struct.unpack_from("<I", e, 0x74)
            (size,) = struct.unpack_from("<Q", e, 0x78)
            self.entries.append({
                "type": etype, "name": name, "start": start,
                "size": size,
            })
        roots = [e for e in self.entries if e["type"] == 5]
        if not roots:
            raise ValueError("OLE file with no root directory entry")
        self.root = roots[0]

    def _load_minifat(self) -> None:
        self.minifat: list[int] = []
        if self.n_minifat and self.minifat_start not in (
            _ENDOFCHAIN, _FREESECT
        ):
            raw = self._read_chain(self.minifat_start)
            self.minifat = list(
                struct.unpack(f"<{len(raw) // 4}I", raw)
            )
        self._mini_container: bytes | None = None

    def _mini_sector(self, n: int) -> bytes:
        if self._mini_container is None:
            self._mini_container = self._read_chain(self.root["start"])
        off = n * self.msz
        s = self._mini_container[off : off + self.msz]
        if len(s) < self.msz:
            raise ValueError(f"OLE mini sector {n} out of range")
        return s

    # -- public surface ---------------------------------------------------
    def stream_names(self) -> list[str]:
        return [e["name"] for e in self.entries if e["type"] == 2]

    def has(self, name: str) -> bool:
        return any(
            e["type"] == 2 and e["name"] == name for e in self.entries
        )

    def stream(self, name: str) -> bytes:
        for e in self.entries:
            if e["type"] == 2 and e["name"] == name:
                size = e["size"]
                if size > len(self.d) * 64:
                    raise ValueError(
                        f"OLE stream {name!r} declares absurd size"
                    )
                if size < self.mini_cutoff:
                    chain = self._chain(e["start"], self.minifat)
                    data = b"".join(self._mini_sector(s) for s in chain)
                else:
                    data = self._read_chain(e["start"])
                if len(data) < size:
                    raise ValueError(f"OLE stream {name!r} truncated")
                return data[:size]
        raise ValueError(f"OLE stream {name!r} not found")


def encode_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Spec-valid minimal compound file: 512-byte sectors, streams
    under 4096 bytes in the mini stream (exercising the reader's
    miniFAT layer), larger ones in regular FAT chains."""
    ssz, msz, cutoff = 512, 64, 4096
    per_sec = ssz // 4

    regular: list[bytes] = []  # sector payloads, index = sector number
    fat: list[int] = []

    def add_chain(data: bytes, unit_src: list[bytes],
                  unit_fat: list[int], unit: int) -> int:
        n = max(1, (len(data) + unit - 1) // unit)
        start = len(unit_src)
        for i in range(n):
            unit_src.append(data[i * unit : (i + 1) * unit].ljust(
                unit, b"\x00"
            ))
            unit_fat.append(
                start + i + 1 if i + 1 < n else _ENDOFCHAIN
            )
        return start

    # mini layer first: pack small streams into the mini container
    mini_sectors: list[bytes] = []
    minifat: list[int] = []
    placements: list[tuple[str, bytes, int, bool]] = []
    for name, data in streams:
        if len(data) < cutoff:
            start = add_chain(data, mini_sectors, minifat, msz)
            placements.append((name, data, start, True))
        else:
            placements.append((name, data, -1, False))
    mini_container = b"".join(mini_sectors)

    # regular sectors: big streams, then the mini container, then
    # miniFAT, then the directory, then FAT itself
    entry_start: dict[str, int] = {}
    for i, (name, data, start, is_mini) in enumerate(placements):
        if not is_mini:
            entry_start[name] = add_chain(data, regular, fat, ssz)
    root_start = (
        add_chain(mini_container, regular, fat, ssz)
        if mini_container else _ENDOFCHAIN
    )
    minifat_start = _ENDOFCHAIN
    n_minifat_sectors = 0
    if minifat:
        mf_raw = b"".join(struct.pack("<I", v) for v in minifat)
        minifat_start = add_chain(mf_raw, regular, fat, ssz)
        n_minifat_sectors = len(regular) - minifat_start

    # directory: root + one entry per stream (no storages needed)
    def dir_entry(name: str, etype: int, start: int, size: int,
                  child: int = _NOSTREAM) -> bytes:
        raw = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _NOSTREAM, _NOSTREAM, child)
        struct.pack_into("<I", e, 0x74, start & 0xFFFFFFFF)
        struct.pack_into("<Q", e, 0x78, size)
        return bytes(e)

    # simple left-spine red-black stand-in: root's child is entry 1,
    # each stream entry points to the next via the "right sibling"
    entries = [dir_entry(
        "Root Entry", 5, root_start, len(mini_container),
        child=1 if placements else _NOSTREAM,
    )]
    for i, (name, data, mstart, is_mini) in enumerate(placements):
        e = bytearray(dir_entry(
            name, 2, mstart if is_mini else entry_start[name],
            len(data),
        ))
        nxt = i + 2 if i + 1 < len(placements) else _NOSTREAM
        struct.pack_into("<I", e, 72, nxt)  # right sibling
        entries.append(bytes(e))
    dir_raw = b"".join(entries)
    dir_start = add_chain(dir_raw, regular, fat, ssz)

    # FAT sectors (assume they fit in the header's 109 DIFAT slots)
    n_data = len(regular)
    n_fat = 1
    while (n_data + n_fat) > n_fat * per_sec:
        n_fat += 1
    total = n_data + n_fat
    full_fat = fat + [_FATSECT] * n_fat
    full_fat += [_FREESECT] * (n_fat * per_sec - len(full_fat))
    fat_raw = b"".join(struct.pack("<I", v) for v in full_fat)
    for i in range(n_fat):
        regular.append(fat_raw[i * ssz : (i + 1) * ssz])
    if n_fat > 109:
        raise ValueError("encode_cfb: too many streams for header DIFAT")

    header = bytearray(512)
    header[:8] = OLE_MAGIC
    struct.pack_into("<H", header, 0x18, 0x003E)  # minor version
    struct.pack_into("<H", header, 0x1A, 3)       # major version 3
    struct.pack_into("<H", header, 0x1C, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 0x1E, 9)
    struct.pack_into("<H", header, 0x20, 6)
    struct.pack_into("<I", header, 0x2C, n_fat)
    struct.pack_into("<I", header, 0x30, dir_start)
    struct.pack_into("<I", header, 0x38, cutoff)
    struct.pack_into("<I", header, 0x3C, minifat_start & 0xFFFFFFFF)
    struct.pack_into("<I", header, 0x40, n_minifat_sectors)
    struct.pack_into("<I", header, 0x44, _ENDOFCHAIN)
    struct.pack_into("<I", header, 0x48, 0)
    difat = [n_data + i for i in range(n_fat)]
    difat += [_FREESECT] * (109 - len(difat))
    struct.pack_into("<109I", header, 0x4C, *difat)
    assert total == len(regular)
    return bytes(header) + b"".join(regular)
