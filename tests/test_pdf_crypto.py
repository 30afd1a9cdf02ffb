"""PDF standard-security-handler crypto: AES against the FIPS-197
Appendix C vectors, RC4 against its published vectors, record
round-trips for every handler generation (R2/R3/R4-AESV2/R5/R6), full
encrypted-document extraction round-trips across font and xref
flavors, and the refusal gates (real user password, non-Standard
handler, unknown /V//R, split crypt-filter layouts)."""

import numpy as np
import pytest

from vectra_py_spark.operators.pdf import (
    encode_pdf,
    pdf_extract_text,
    pdf_info,
)
from vectra_py_spark.operators.pdf_crypto import (
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_ecb_encrypt_block,
    compute_o,
    compute_u,
    hash_2b,
    make_v5_records,
    object_key,
    rc4,
    std_file_key,
    v5_file_key,
    verify_user_password,
    verify_v5_password,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

_FIPS_PT = bytes.fromhex("00112233445566778899aabbccddeeff")


def test_aes_fips197_appendix_c_vectors():
    for klen, want in (
        (16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (32, "8ea2b7ca516745bfeafc49904b496089"),
    ):
        ct = aes_ecb_encrypt_block(bytes(range(klen)), _FIPS_PT)
        assert ct.hex() == want


def test_rc4_published_vectors():
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert rc4(b"Secret", b"Attack at dawn").hex().upper() == (
        "45A01F645FC35B383552544B9BF5"
    )
    # involution: same keystream both directions
    assert rc4(b"k", rc4(b"k", b"data")) == b"data"


def test_aes_cbc_roundtrip_and_padding_contract():
    key = bytes(range(32))
    for n in (0, 1, 15, 16, 17, 255):
        data = (bytes(range(256)) * 2)[:n]
        ct = aes_cbc_encrypt(key, bytes(16), data)
        assert len(ct) % 16 == 0 and ct[:16] == bytes(16)
        assert aes_cbc_decrypt(key, ct) == data
    with pytest.raises(ValueError, match="too short"):
        aes_cbc_decrypt(key, b"\x00" * 17)
    # corrupt padding byte → ValueError, not garbage text
    ct = bytearray(aes_cbc_encrypt(key, bytes(16), b"hello"))
    ct[-1] ^= 0xFF
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, bytes(ct))


def test_handler_record_roundtrips_all_revisions():
    """Writer-side O/U(/OE/UE) records verify with the reader-side
    algorithms for every supported revision — independent code paths
    of the same spec."""
    for r, length in ((2, 40), (3, 128), (4, 128)):
        o = compute_o(b"owner", b"", r if r != 4 else 3, length)
        key = std_file_key(b"", o, -4, b"fileid01", r, length)
        u = compute_u(key, b"fileid01", r)
        assert verify_user_password(b"", o, u, -4, b"fileid01", r, length) == key
        assert (
            verify_user_password(b"pw", o, u, -4, b"fileid01", r, length)
            is None
        )
    fk = v5_file_key(7, b"seed")
    for r in (5, 6):
        recs = make_v5_records(fk, b"", b"owner", -4, r=r)
        assert verify_v5_password(
            b"", recs["O"], recs["U"], recs["OE"], recs["UE"], r
        ) == fk
        # the OWNER password also opens (algorithm 2.A second branch)
        assert verify_v5_password(
            b"owner", recs["O"], recs["U"], recs["OE"], recs["UE"], r
        ) == fk
        assert verify_v5_password(
            b"nope", recs["O"], recs["U"], recs["OE"], recs["UE"], r
        ) is None
    # R6 hardened hash differs from the plain SHA-256 of R5
    assert hash_2b(b"x", b"salt8888", b"", 6) != hash_2b(
        b"x", b"salt8888", b"", 5
    )
    # per-object keys differ per object and per aes flag
    k = object_key(b"0123456789abcdef", 3, 0, aes=False)
    assert k != object_key(b"0123456789abcdef", 4, 0, aes=False)
    assert k != object_key(b"0123456789abcdef", 3, 0, aes=True)


_PAGES = [["secret alpha", "beta line"], ["page two text"]]
_WANT = ["secret alpha\nbeta line", "page two text"]


@pytest.mark.parametrize("mode", ["rc4-40", "rc4", "aesv2", "aesv3"])
def test_encrypted_document_roundtrip(mode):
    """Every handler generation, over both fonts and both xref
    flavors (with ObjStm where legal): plaintext must not appear in
    the payload; extraction must be exact; pdf_info must see through
    the encryption (it walks the page tree via decrypted objects)."""
    for font in ("type1", "type0"):
        for xref_stream, objstm in ((False, False), (True, True)):
            b = encode_pdf(
                _PAGES, xref_stream=xref_stream, objstm=objstm,
                font=font, encrypt="owner-secret", encrypt_mode=mode,
            )
            assert b"secret alpha" not in b
            assert pdf_extract_text(b) == _WANT
            assert pdf_info(b)["n_pages"] == 2


def test_encrypted_objstm_survives_broken_xref_scan_fallback():
    """Encrypted document + ObjStm packing + a BROKEN xref chain: the
    fallback scan's ObjStm surfacing runs before key derivation, so it
    must be re-run after _init_crypt or every ObjStm-packed object
    (catalog, page tree, font) becomes a 'not found' refusal even
    though the empty-user-password key decrypts them fine (ADVICE r8)."""
    for mode in ("rc4", "aesv2"):
        b = encode_pdf(
            _PAGES, xref_stream=True, objstm=True,
            encrypt="owner-secret", encrypt_mode=mode,
        )
        # sever the startxref tail → no offset chain → full-payload scan
        broken = b[: b.rfind(b"startxref")]
        assert pdf_extract_text(broken) == _WANT, mode
        assert pdf_info(broken)["n_pages"] == 2, mode


def test_encrypted_uncompressed_strings_are_ciphertext():
    """compress=False leaves raw content streams — they must STILL be
    unreadable (stream-level encryption), and the type0 CIDSystemInfo
    literal strings must be ciphertext hex, not (Adobe)."""
    b = encode_pdf(
        _PAGES, compress=False, font="type0",
        encrypt="owner-secret", encrypt_mode="aesv2",
    )
    assert b"secret alpha" not in b and b"(Adobe)" not in b
    assert pdf_extract_text(b) == _WANT


@pytest.mark.parametrize("mode", ["rc4-40", "rc4", "aesv2", "aesv3"])
def test_password_ladder_opens_protected_documents(mode):
    """Round 9: a SUPPLIED password opens real user-password-protected
    documents — tried as user (Algorithm 6 / 2.A) then owner
    (Algorithm 7 / 2.A owner leg), empty-user fallback preserved; a
    wrong password refuses with the 'wrong password' message."""
    from vectra_py_spark.operators.pdf import extract_pdf_text_df  # noqa: F401

    b = encode_pdf(
        _PAGES, encrypt="owner-secret", encrypt_mode=mode,
        user_password="hunter2",
    )
    with pytest.raises(ValueError, match="without the"):
        pdf_extract_text(b)
    with pytest.raises(ValueError, match="wrong password"):
        pdf_extract_text(b, password="nope")
    assert pdf_extract_text(b, password="hunter2") == _WANT
    assert pdf_extract_text(b, password="owner-secret") == _WANT
    assert pdf_info(b, password="hunter2")["n_pages"] == 2
    # a password supplied against an EMPTY-user-password doc falls
    # back to the empty user password (the viewer ladder)
    b2 = encode_pdf(_PAGES, encrypt="o", encrypt_mode=mode)
    assert pdf_extract_text(b2, password="whatever") == _WANT


def test_password_df_operator(spark):
    from vectra_py_spark.operators.pdf import extract_pdf_text_df

    b = encode_pdf(
        [["locked row"]], encrypt="own", encrypt_mode="rc4",
        user_password="pw1",
    )
    df = spark.createDataFrame(
        [("d", bytearray(b))], "media_id string, data binary"
    )
    rows = extract_pdf_text_df(df, password="pw1").collect()
    assert [r.text for r in rows] == ["locked row"]
    bad = extract_pdf_text_df(df, on_error="quarantine").collect()
    assert bad[0].error and "password" in bad[0].error


def test_password_protected_refuses():
    """A document whose user password is NOT empty must refuse by
    name — simulated by corrupting /U in place (same length, so all
    offsets stay valid)."""
    for mode in ("rc4", "aesv3"):
        b = encode_pdf(_PAGES, encrypt="o", encrypt_mode=mode)
        i = b.index(b"/U <") + 4  # first hex digit of the /U record
        corrupted = bytearray(b)
        corrupted[i] = ord("0") if b[i : i + 1] != b"0" else ord("1")
        with pytest.raises(ValueError, match="password-protected"):
            pdf_extract_text(bytes(corrupted))


def test_unsupported_encryption_refuses_by_name():
    b = encode_pdf(_PAGES, encrypt="o", encrypt_mode="rc4")
    # non-Standard handler (same-length surgery)
    ns = b.replace(b"/Filter /Standard", b"/Filter /Standarf")
    with pytest.raises(ValueError, match="non-Standard"):
        pdf_extract_text(ns)
    # unknown revision pairing
    vr = b.replace(b"/V 2 /R 3", b"/V 2 /R 9")
    with pytest.raises(ValueError, match="unsupported PDF encryption"):
        pdf_extract_text(vr)
    # split /Identity crypt-filter layout (V4)
    b4 = encode_pdf(_PAGES, encrypt="o", encrypt_mode="aesv2")
    ident = b4.replace(b"/StrF /StdCF", b"/StrF /Identi")
    with pytest.raises(ValueError, match="crypt-filter layout"):
        pdf_extract_text(ident)
    # unknown /CFM
    cfm = b4.replace(b"/CFM /AESV2", b"/CFM /AESV9")
    with pytest.raises(ValueError, match="crypt-filter method"):
        pdf_extract_text(cfm)


def test_encrypted_fuzz_valueerror_only():
    """Seeded mutations over an encrypted document: the ValueError-
    only malformed contract holds with the crypto layer in the loop
    (bad padding, truncated ciphertext, corrupted records)."""
    import sys

    sys.path.insert(0, "tests")
    from test_codec_fuzz import _mutations

    for mode in ("rc4", "aesv2", "aesv3"):
        base = encode_pdf([["fuzz seed text"]], encrypt="o",
                          encrypt_mode=mode)
        rng = np.random.default_rng(hash(mode) % (2**32))
        for mut in _mutations(base, rng, 120):
            try:
                pdf_extract_text(mut)
            except ValueError:
                pass


def test_quarantine_flow_with_encrypted_pdfs(spark):
    """extract_pdf_text_df: a good encrypted PDF extracts; a password-
    protected one quarantines with the named error."""
    from vectra_py_spark.operators.pdf import extract_pdf_text_df

    good = encode_pdf(_PAGES, encrypt="o", encrypt_mode="aesv2")
    i = good.index(b"/U <") + 4
    bad = bytearray(good)
    bad[i] = ord("0") if good[i : i + 1] != b"0" else ord("1")
    df = spark.createDataFrame(
        [("g", bytearray(good)), ("b", bytes(bad))],
        "media_id string, data binary",
    )
    rows = {
        (r.media_id, r.page): r
        for r in extract_pdf_text_df(df, on_error="quarantine").collect()
    }
    assert rows[("g", 0)].text == _WANT[0]
    assert rows[("g", 1)].text == _WANT[1]
    assert rows[("b", -1)].error and "password-protected" in rows[
        ("b", -1)
    ].error


def test_pdf_triage_lanes_policy(spark):
    """pdf_triage_lanes: plaintext and cheap-crypto docs go 'fast',
    AES-256 goes 'budgeted' (no key derivation runs — the probe stays
    header-cheap), malformed goes 'quarantine' with the named error;
    custom budget_flavors widen the budgeted lane."""
    from vectra_py_spark.operators.pdf import pdf_triage_lanes

    rows = [
        ("plain", bytearray(encode_pdf(_PAGES))),
        ("rc4", bytearray(encode_pdf(
            _PAGES, encrypt="o", encrypt_mode="rc4"))),
        ("aes128", bytearray(encode_pdf(
            _PAGES, encrypt="o", encrypt_mode="aesv2"))),
        ("aes256", bytearray(encode_pdf(
            _PAGES, encrypt="o", encrypt_mode="aesv3"))),
        ("broken", bytearray(b"%PDF-1.4 not really")),
    ]
    df = spark.createDataFrame(rows, "media_id string, data binary")
    got = {r.media_id: r for r in pdf_triage_lanes(df).collect()}
    assert got["plain"].lane == "fast" and got["plain"].encryption is None
    assert got["rc4"].lane == "fast" and got["rc4"].encryption == "rc4"
    assert (got["aes128"].lane, got["aes128"].encryption) == (
        "fast", "aesv2")
    assert (got["aes256"].lane, got["aes256"].encryption) == (
        "budgeted", "aesv3")
    assert got["aes256"].n_pages == 2  # classic xref: tree still walks
    assert got["broken"].lane == "quarantine" and got["broken"].error
    # widen the budget: treat every encrypted doc as budgeted
    wide = {
        r.media_id: r.lane
        for r in pdf_triage_lanes(
            df, budget_flavors=("rc4", "aesv2", "aesv3")
        ).collect()
    }
    assert wide == {"plain": "fast", "rc4": "budgeted",
                    "aes128": "budgeted", "aes256": "budgeted",
                    "broken": "quarantine"}


def test_numpy_aes_path_equals_scalar():
    """The vectorized all-blocks AES decrypt (used above the size
    threshold) must be byte-identical to the scalar FIPS-197 loop —
    property-tested across key sizes and lengths straddling the
    threshold."""
    from vectra_py_spark.operators.pdf_crypto import (
        _aes_cbc_nopad_decrypt,
        _aes_decrypt_blocks_np,
        _decrypt_block,
        _expand_key,
    )

    rng = np.random.default_rng(4242)
    for klen in (16, 24, 32):
        key = rng.integers(0, 256, klen, dtype=np.uint8).tobytes()
        rk = _expand_key(key)
        for n in (496, 512, 513 * 16, 4096):
            n -= n % 16
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            vec = _aes_decrypt_blocks_np(rk, data)
            scalar = b"".join(
                _decrypt_block(rk, data[i : i + 16])
                for i in range(0, n, 16)
            )
            assert vec == scalar
            iv = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            # the CBC wrapper picks the path by size — compare against
            # a hand-chained scalar CBC
            want = bytearray()
            prev = iv
            for i in range(0, n, 16):
                blk = data[i : i + 16]
                want += bytes(
                    a ^ b
                    for a, b in zip(_decrypt_block(rk, blk), prev)
                )
                prev = blk
            assert _aes_cbc_nopad_decrypt(key, iv, data) == bytes(want)


def test_pdf_probe_is_header_cheap_triage():
    """pdf_probe reports encryption flavor + page count WITHOUT the
    key-stretch verification: AES-256 probe must be ms-scale (the full
    open is ~400 ms), and password-protected documents must PROBE fine
    while extraction refuses — the probe-before-decode policy."""
    import time

    from vectra_py_spark.operators.pdf import pdf_probe
    from vectra_py_spark.operators.probe import probe_payload

    plain = encode_pdf(_PAGES)
    assert pdf_probe(plain) == {
        "version": "1.4", "n_pages": 2,
        "encrypted": False, "encryption": None,
    }
    for mode, want in (("rc4-40", "rc4"), ("rc4", "rc4"),
                       ("aesv2", "aesv2"), ("aesv3", "aesv3")):
        info = pdf_probe(encode_pdf(_PAGES, encrypt="o",
                                    encrypt_mode=mode))
        assert info["encrypted"] and info["encryption"] == want
        assert info["n_pages"] == 2
    b3 = encode_pdf(_PAGES, encrypt="o", encrypt_mode="aesv3")
    t0 = time.time()
    for _ in range(20):
        pdf_probe(b3)
    assert (time.time() - t0) / 20 < 0.05  # no key stretch ran
    # password-protected: probe fine, extract refuses
    i = b3.index(b"/U <") + 4
    bad = bytearray(b3)
    bad[i] = ord("0") if b3[i : i + 1] != b"0" else ord("1")
    assert probe_payload(bytes(bad)) == {"kind": "pdf", "n_frames": 2}
    with pytest.raises(ValueError, match="password-protected"):
        pdf_extract_text(bytes(bad))


def test_hash_2b_matches_reference_loop_semantics():
    """The R6 hardened hash must exit on ``last byte of E <=
    completed_rounds - 32`` (ISO 32000-2 Algorithm 2.B) — an
    off-by-one here diverges from conforming readers on ~1-2% of
    inputs and round-trip tests can't see it because writer and
    reader share the function (review finding). Compare against an
    independently-written reference loop over random inputs."""
    import hashlib

    from vectra_py_spark.operators.pdf_crypto import (
        aes_cbc_nopad_encrypt,
    )

    def reference(pw, salt, udata):
        pw = pw[:127]
        k = hashlib.sha256(pw + salt + udata).digest()
        count = 0
        while True:
            k1 = (pw + k + udata) * 64
            e = aes_cbc_nopad_encrypt(k[:16], k[16:32], k1)
            k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
                sum(e[:16]) % 3
            ](e).digest()
            count += 1
            if count >= 64 and e[-1] <= count - 32:
                return k[:32]

    rng = np.random.default_rng(20260815)
    for _ in range(120):
        pw = bytes(rng.integers(0, 256, rng.integers(0, 20)))
        salt = bytes(rng.integers(0, 256, 8))
        assert hash_2b(pw, salt, b"", 6) == reference(pw, salt, b"")
    # pinned digests for fixed inputs (ADVICE r8: the loop above
    # shares its structure with hash_2b, so it guards regressions but
    # not the derivation itself; these values are frozen outputs of
    # the FIPS-197-validated implementation — any future change to the
    # exit test, the hash rotation, or the K1 repetition breaks them)
    for pw, salt, udata, want in (
        (b"", bytes(range(8)), b"",
         "1403c04eb647d2e60452dfc4eb0a5e0c"
         "f322e8a83a759eabbd17d498a93ba041"),
        (b"password", b"\x01\x02\x03\x04\x05\x06\x07\x08", b"",
         "22d08d1860cb92edcadda1451a4aebb4"
         "9c1873722bbfca2aef1a7e5f51e69935"),
        (b"owner", b"saltsalt", bytes(range(48)),
         "94719cf805d1ad642d5e4b10a4f8dec2"
         "44248f53b0d6d63470e246329b18f0b8"),
        (b"x" * 127, b"\xff" * 8, b"U" * 48,
         "5828602a6c8bcc2dd0bd0388c3007a1d"
         "be1a0de7906e80d4d673b69992a9287d"),
    ):
        assert hash_2b(pw, salt, udata, 6).hex() == want
    # Algorithm 2.A step (a): passwords truncate to 127 bytes, so a
    # longer password must verify identically to its truncation
    long_pw = b"x" * 300
    fk = v5_file_key(9, b"truncseed")
    recs = make_v5_records(fk, b"", long_pw, -4, r=6)
    assert verify_v5_password(
        long_pw[:127], recs["O"], recs["U"], recs["OE"], recs["UE"], 6
    ) == fk
    assert verify_v5_password(
        long_pw, recs["O"], recs["U"], recs["OE"], recs["UE"], 6
    ) == fk


def test_pdf_probe_rejects_corrupt_plaintext_page_tree():
    """A PLAINTEXT document with a broken page tree must raise from
    pdf_probe (→ probe quarantine row), not probe as a clean PDF that
    passes triage (review finding); only ENCRYPTED trees degrade to
    n_pages=None."""
    from vectra_py_spark.operators.pdf import pdf_probe
    from vectra_py_spark.operators.probe import probe_payload

    b = encode_pdf(_PAGES)
    broken = b.replace(b"/Type /Pages", b"/Type /Pagez", 1)
    with pytest.raises(ValueError):
        pdf_probe(broken)
    with pytest.raises(ValueError):
        probe_payload(broken)
    # encrypted + ObjStm: tree unreachable without the key → None,
    # still probes (that IS the cheap-triage point)
    bo = encode_pdf(_PAGES, encrypt="o", encrypt_mode="aesv2",
                    xref_stream=True, objstm=True)
    info = pdf_probe(bo)
    assert info["encrypted"] and info["n_pages"] is None
