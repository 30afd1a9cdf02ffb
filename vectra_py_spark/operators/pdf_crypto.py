"""PDF standard-security-handler cryptography — pure stdlib, from the
public specs: ISO 32000-1 §7.6 (RC4 / AES-128 handlers, algorithms
1–7) and ISO 32000-2 §7.6.4 (AES-256, algorithms 2.A/2.B/8/9/10), with
RC4 from its published description and AES from FIPS-197 (S-box and
MixColumns built from the GF(2^8) arithmetic rather than pasted
tables).

Both directions are implemented — derivation/verification for the
reader and O/U/OE/UE/Perms construction for the writer — so encrypted
fixtures are generated and consumed by independent code paths of the
same spec, the FLAC-style round-trip discipline.

Scale shape: called per-string/per-stream inside worker-side PDF
parsing (mapInPandas); cost is linear in ciphertext bytes and PDFs
never shuffle. Pure-Python AES is ~1 MB/s — fine for the text-bearing
streams extraction touches; a corpus-scale decrypt of image-heavy PDFs
would want a native cipher, which this container deliberately lacks.
"""

from __future__ import annotations

import hashlib

__all__ = [
    "rc4",
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "aes_cbc_nopad_encrypt",
    "aes_ecb_encrypt_block",
    "std_file_key",
    "verify_user_password",
    "compute_o",
    "compute_u",
    "object_key",
    "hash_2b",
    "verify_v5_password",
    "v5_file_key",
    "make_v5_records",
    "CRYPT_PAD",
]

# The 32-byte password pad, ISO 32000-1 Table 7.6.3.3-1.
CRYPT_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


# ---------------------------------------------------------------------------
# RC4 — symmetric, so one function serves both directions
# ---------------------------------------------------------------------------
def rc4(key: bytes, data: bytes) -> bytes:
    if not key:
        raise ValueError("RC4 key must be non-empty")
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES (FIPS-197): 128/192/256-bit keys, CBC mode. Tables derived from
# the field arithmetic at import time.
# ---------------------------------------------------------------------------
def _gf_tables() -> tuple[list[int], list[int]]:
    """exp/log tables over GF(2^8) with generator 3 (x ↦ x·(x+1))."""
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by 3: x ^ xtime(x), reducing by the AES polynomial
        xt = (x << 1) ^ (0x11B if x & 0x80 else 0)
        x ^= xt
        x &= 0xFF
    return exp, log


_EXP, _LOG = _gf_tables()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[(_LOG[a] + _LOG[b]) % 255]


def _build_sbox() -> tuple[list[int], list[int]]:
    """S-box = affine transform of the multiplicative inverse."""
    sbox = [0] * 256
    for a in range(256):
        inv = 0 if a == 0 else _EXP[(255 - _LOG[a]) % 255]
        b = inv
        s = 0x63
        for k in range(5):
            s ^= ((b << k) | (b >> (8 - k))) & 0xFF
        sbox[a] = s
    inv_sbox = [0] * 256
    for a, v in enumerate(sbox):
        inv_sbox[v] = a
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01]
while len(_RCON) < 14:
    r = _RCON[-1] << 1
    _RCON.append((r ^ 0x11B) & 0xFF if r & 0x100 else r)


def _expand_key(key: bytes) -> list[list[int]]:
    """Round keys as a list of 16-byte lists (Nr+1 of them)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [
        sum(words[4 * r : 4 * r + 4], []) for r in range(nr + 1)
    ]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _build_ttables() -> list[list[int]]:
    """Combined SubBytes+MixColumns word tables (the classic public
    T-table formulation) — one 32-bit lookup replaces four field
    multiplies, which matters because the R6 password hash (algorithm
    2.B) runs tens of thousands of sequential block encryptions that
    CANNOT vectorize across blocks the way decryption can."""
    t0, t1, t2, t3 = [], [], [], []
    for x in range(256):
        s = _SBOX[x]
        s2, s3 = _gmul(s, 2), _gmul(s, 3)
        t0.append((s2 << 24) | (s << 16) | (s << 8) | s3)
        t1.append((s3 << 24) | (s2 << 16) | (s << 8) | s)
        t2.append((s << 24) | (s3 << 16) | (s2 << 8) | s)
        t3.append((s << 24) | (s << 16) | (s3 << 8) | s2)
    return [t0, t1, t2, t3]


_T0, _T1, _T2, _T3 = _build_ttables()


def _encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    sbox = _SBOX
    t0, t1, t2, t3 = _T0, _T1, _T2, _T3
    s = [b ^ k for b, k in zip(block, rk[0])]
    nr = len(rk) - 1
    for rnd in range(1, nr):
        k = rk[rnd]
        w0 = t0[s[0]] ^ t1[s[5]] ^ t2[s[10]] ^ t3[s[15]]
        w1 = t0[s[4]] ^ t1[s[9]] ^ t2[s[14]] ^ t3[s[3]]
        w2 = t0[s[8]] ^ t1[s[13]] ^ t2[s[2]] ^ t3[s[7]]
        w3 = t0[s[12]] ^ t1[s[1]] ^ t2[s[6]] ^ t3[s[11]]
        s = [
            (w0 >> 24) ^ k[0], ((w0 >> 16) & 0xFF) ^ k[1],
            ((w0 >> 8) & 0xFF) ^ k[2], (w0 & 0xFF) ^ k[3],
            (w1 >> 24) ^ k[4], ((w1 >> 16) & 0xFF) ^ k[5],
            ((w1 >> 8) & 0xFF) ^ k[6], (w1 & 0xFF) ^ k[7],
            (w2 >> 24) ^ k[8], ((w2 >> 16) & 0xFF) ^ k[9],
            ((w2 >> 8) & 0xFF) ^ k[10], (w2 & 0xFF) ^ k[11],
            (w3 >> 24) ^ k[12], ((w3 >> 16) & 0xFF) ^ k[13],
            ((w3 >> 8) & 0xFF) ^ k[14], (w3 & 0xFF) ^ k[15],
        ]
    k = rk[nr]
    return bytes(
        sbox[s[_SHIFT[i]]] ^ k[i] for i in range(16)
    )


def _decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[nr])]
    for rnd in range(nr - 1, 0, -1):
        s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        t = []
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            t += [
                _gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13) ^ _gmul(a3, 9),
                _gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11) ^ _gmul(a3, 13),
                _gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14) ^ _gmul(a3, 11),
                _gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9) ^ _gmul(a3, 14),
            ]
        s = t
    s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
    return bytes(b ^ k for b, k in zip(s, rk[0]))


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One raw block (the /Perms entry is a single ECB block)."""
    if len(block) != 16:
        raise ValueError("AES block must be 16 bytes")
    return _encrypt_block(_expand_key(key), block)


def aes_cbc_nopad_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC without padding — the hash-2B inner loop and the OE/UE
    records require exact-multiple inputs."""
    if len(data) % 16:
        raise ValueError("CBC-nopad data must be a multiple of 16")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(rk, blk)
        out += prev
    return bytes(out)


def _aes_decrypt_blocks_np(rk: list[list[int]], data: bytes) -> bytes:
    """All-blocks-at-once raw AES decryption with numpy table lookups.
    Unlike encryption, CBC DECRYPTION is embarrassingly parallel (the
    chaining XOR uses known ciphertext), so the per-block Python loop
    — ~1 MB/s — vectorizes across the whole stream. Kept equal to
    :func:`_decrypt_block` by a property test."""
    import numpy as np

    n = len(data) // 16
    s = np.frombuffer(data, dtype=np.uint8).reshape(n, 16).copy()
    inv_sbox = np.array(_INV_SBOX, dtype=np.uint8)
    t = {
        m: np.array([_gmul(x, m) for x in range(256)], dtype=np.uint8)
        for m in (9, 11, 13, 14)
    }
    inv_shift = np.array(_INV_SHIFT)
    keys = [np.array(k, dtype=np.uint8) for k in rk]
    nr = len(rk) - 1
    s ^= keys[nr]
    for rnd in range(nr - 1, 0, -1):
        s = inv_sbox[s[:, inv_shift]]
        s ^= keys[rnd]
        a0, a1 = s[:, 0::4], s[:, 1::4]
        a2, a3 = s[:, 2::4], s[:, 3::4]
        out = np.empty_like(s)
        out[:, 0::4] = t[14][a0] ^ t[11][a1] ^ t[13][a2] ^ t[9][a3]
        out[:, 1::4] = t[9][a0] ^ t[14][a1] ^ t[11][a2] ^ t[13][a3]
        out[:, 2::4] = t[13][a0] ^ t[9][a1] ^ t[14][a2] ^ t[11][a3]
        out[:, 3::4] = t[11][a0] ^ t[13][a1] ^ t[9][a2] ^ t[14][a3]
        s = out
    s = inv_sbox[s[:, inv_shift]]
    s ^= keys[0]
    return s.tobytes()


# Below this many ciphertext bytes the numpy call overhead loses to
# the scalar loop; above it the vectorized path is ~50x faster.
_NP_THRESHOLD = 512


def _aes_cbc_nopad_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("AES ciphertext length not a multiple of 16")
    rk = _expand_key(key)
    if len(data) >= _NP_THRESHOLD:
        try:
            import numpy  # noqa: F401 — stdlib-only still works below
        except ImportError:
            pass
        else:
            import numpy as np

            dec = _aes_decrypt_blocks_np(rk, data)
            prev = iv + data[:-16]
            return (
                np.frombuffer(dec, dtype=np.uint8)
                ^ np.frombuffer(prev, dtype=np.uint8)
            ).tobytes()
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(
            a ^ b for a, b in zip(_decrypt_block(rk, blk), prev)
        )
        prev = blk
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PDF stream/string form: IV-prefixed CBC with PKCS#7 padding."""
    pad = 16 - len(data) % 16
    return iv + aes_cbc_nopad_encrypt(key, iv, data + bytes([pad]) * pad)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_cbc_encrypt`; ValueError on any malformed
    shape (contract: corrupt ciphertext quarantines, never crashes)."""
    if len(data) < 32:
        # an empty plaintext still carries IV + one padding block
        if len(data) == 16:
            return b""  # degenerate: some writers emit bare IV for ""
        raise ValueError("AES ciphertext too short")
    plain = _aes_cbc_nopad_decrypt(key, data[:16], data[16:])
    pad = plain[-1]
    if not 1 <= pad <= 16 or plain[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES PKCS#7 padding")
    return plain[:-pad]


# ---------------------------------------------------------------------------
# Standard security handler, R2–R4 (ISO 32000-1 §7.6.3)
# ---------------------------------------------------------------------------
def _pad_password(pw: bytes) -> bytes:
    return (pw + CRYPT_PAD)[:32]


def std_file_key(
    pw: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    length: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from a user password."""
    h = hashlib.md5(
        _pad_password(pw) + o[:32]
        + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    )
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    n = 5 if r == 2 else max(5, min(16, length // 8))
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, length: int) -> bytes:
    """Algorithm 3: the /O (owner) record."""
    key = hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    n = 5 if r == 2 else max(5, min(16, length // 8))
    out = rc4(key[:n], _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key[:n]), out)
    return out


def compute_u(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3+): the /U (user) record."""
    if r == 2:
        return rc4(file_key, CRYPT_PAD)
    h = hashlib.md5(CRYPT_PAD + id0).digest()
    out = rc4(file_key, h)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in file_key), out)
    return out + b"\x00" * 16  # padded to 32 bytes per spec


def verify_user_password(
    pw: bytes,
    o: bytes,
    u: bytes,
    p: int,
    id0: bytes,
    r: int,
    length: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 6: file key if ``pw`` is the user password, else
    None. R3+ compares only the first 16 bytes of /U per spec."""
    key = std_file_key(pw, o, p, id0, r, length, encrypt_metadata)
    want = compute_u(key, id0, r)
    got_ok = (
        want[:32] == u[:32] if r == 2 else want[:16] == u[:16]
    )
    return key if got_ok else None


def verify_owner_password(
    pw: bytes,
    o: bytes,
    u: bytes,
    p: int,
    id0: bytes,
    r: int,
    length: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 7: file key if ``pw`` is the OWNER password, else
    None — the RC4 rounds of Algorithm 3 are inverted (same keys,
    reverse order; RC4 is an involution) to recover the PADDED user
    password, which then runs through Algorithm 6. Feeding the
    already-padded 32 bytes back in is sound because padding is
    ``(pw + PAD)[:32]`` — a fixed point at 32 bytes."""
    key = hashlib.md5(_pad_password(pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    n = 5 if r == 2 else max(5, min(16, length // 8))
    data = o[:32]
    if r == 2:
        user_padded = rc4(key[:n], data)
    else:
        for i in range(19, -1, -1):
            data = rc4(bytes(b ^ i for b in key[:n]), data)
        user_padded = data
    return verify_user_password(
        user_padded, o, u, p, id0, r, length, encrypt_metadata
    )


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object key (R2–R4; V5 uses the file key
    directly)."""
    ext = num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    if aes:
        ext += b"sAlT"
    return hashlib.md5(file_key + ext).digest()[
        : min(len(file_key) + 5, 16)
    ]


# ---------------------------------------------------------------------------
# AES-256 handler, R5 (/AESV3, Acrobat 9) and R6 (PDF 2.0) —
# ISO 32000-2 §7.6.4.3.3/4 and §7.6.4.4.9 (algorithms 2.A / 2.B).
# ---------------------------------------------------------------------------
def hash_2b(pw: bytes, salt: bytes, udata: bytes, r: int = 6) -> bytes:
    """Algorithm 2.B (R6) — or plain SHA-256 for R5. The password is
    truncated to 127 UTF-8 bytes first (Algorithm 2.A step a) and the
    loop exit compares the last byte of E against
    ``completed_rounds - 32`` — both places where an off-by-one
    silently diverges from conforming readers (found in review; the
    round-trip tests can't catch it because writer and reader share
    this function)."""
    pw = pw[:127]
    k = hashlib.sha256(pw + salt + udata).digest()
    if r == 5:
        return k
    completed = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_nopad_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](
            e
        ).digest()
        completed += 1
        if completed >= 64 and e[-1] <= completed - 32:
            return k[:32]


def verify_v5_password(
    pw: bytes, o: bytes, u: bytes, oe: bytes, ue: bytes, r: int
) -> bytes | None:
    """Algorithm 2.A: try ``pw`` as user then owner password; return
    the 32-byte file key on success, None on failure. /O and /U are
    48 bytes: hash(32) + validation salt(8) + key salt(8)."""
    if len(u) < 48 or len(o) < 48:
        raise ValueError("PDF V5 /U and /O records must be 48 bytes")
    pw = pw[:127]  # Algorithm 2.A step (a)
    # user password
    if hash_2b(pw, u[32:40], b"", r) == u[:32]:
        ikey = hash_2b(pw, u[40:48], b"", r)
        return _aes_cbc_nopad_decrypt(ikey, b"\x00" * 16, ue[:32])
    # owner password (udata = the full 48-byte /U)
    if hash_2b(pw, o[32:40], u[:48], r) == o[:32]:
        ikey = hash_2b(pw, o[40:48], u[:48], r)
        return _aes_cbc_nopad_decrypt(ikey, b"\x00" * 16, oe[:32])
    return None


def v5_file_key(n: int, seed: bytes) -> bytes:
    """Deterministic 32-byte file key for the writer (fixtures must be
    reproducible; a production writer would use os.urandom)."""
    return hashlib.sha256(b"vectra-pdf-key:%d:" % n + seed).digest()


def make_v5_records(
    file_key: bytes,
    user_pw: bytes,
    owner_pw: bytes,
    p: int,
    r: int = 6,
    encrypt_metadata: bool = True,
) -> dict[str, bytes]:
    """Algorithms 8/9/10: the /U,/UE,/O,/OE,/Perms records (writer
    side). Salts are derived deterministically from the key."""
    def salt(tag: bytes) -> bytes:
        return hashlib.sha256(tag + file_key).digest()[:8]

    uvs, uks, ovs, oks = (
        salt(b"uvs"), salt(b"uks"), salt(b"ovs"), salt(b"oks")
    )
    u = hash_2b(user_pw, uvs, b"", r) + uvs + uks
    ue = aes_cbc_nopad_encrypt(
        hash_2b(user_pw, uks, b"", r), b"\x00" * 16, file_key
    )
    o = hash_2b(owner_pw, ovs, u, r) + ovs + oks
    oe = aes_cbc_nopad_encrypt(
        hash_2b(owner_pw, oks, u, r), b"\x00" * 16, file_key
    )
    perms = bytearray((p & 0xFFFFFFFF).to_bytes(4, "little"))
    perms += b"\xff\xff\xff\xff"
    perms += b"T" if encrypt_metadata else b"F"
    perms += b"adb\x00\x00\x00\x00"
    return {
        "U": u, "UE": ue, "O": o, "OE": oe,
        "Perms": aes_ecb_encrypt_block(file_key, bytes(perms)),
    }
