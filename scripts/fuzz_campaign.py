#!/usr/bin/env python
"""Extended fuzz campaign over every byte-level parser in the repo:
all ten media codecs (direct + auto dispatch), probe_payload, the WARC
record parser (plain + gzip), and PDF extraction across every
container/filter/font flavor. The contract under test is uniform —
decode correctly or raise ValueError, NOTHING else escapes — because
every quarantine layer (`on_error='quarantine'`, per-file WARC rows,
`extract_pdf_text_df`) catches exactly ValueError; any other exception
type is a failed Spark stage at crawl scale.

Usage: python scripts/fuzz_campaign.py [mutations_per_target]
Prints one JSON line; non-ValueError escapes list (target, exc_type,
seed, index) tuples for regression pinning.
"""

from __future__ import annotations

import base64
import json
import re
import sys
import time
import zlib
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402

from test_codec_fuzz import _mutations, _valid_payloads  # noqa: E402
from test_pdf import _lzw_encode  # noqa: E402
from vectra_py_spark.operators import multimodal as mm  # noqa: E402
from vectra_py_spark.operators.pdf import (  # noqa: E402
    encode_pdf,
    pdf_extract_text,
    pdf_info,
)
from vectra_py_spark.operators.probe import probe_payload  # noqa: E402
from vectra_py_spark.sources.warc import parse_warc, synth_warc  # noqa: E402


def _pdf_flavors() -> dict[str, bytes]:
    pages = [["campaign line one", "two"], ["page two"]]
    plain = encode_pdf(pages, compress=False)
    m = re.search(rb"/Length (\d+) >>\nstream\n", plain)
    start, length = m.end(), int(m.group(1))
    ops = plain[start : start + length]

    def rebuild(encoded: bytes, filt: bytes) -> bytes:
        return (
            plain[: m.start()] + filt + b" /Length "
            + str(len(encoded)).encode() + b" >>\nstream\n" + encoded
            + plain[start + length :]
        )

    cmap = (b"2 beginbfchar <41> <00E4> <20> <0020> endbfchar\n"
            b"1 beginbfrange <42> <44> <0100> endbfrange\nendcmap")
    fonty = plain.replace(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding /Differences "
        b"[65 /adieresis] >> /ToUnicode 99 0 R >>",
    ) + (b"99 0 obj\n<< /Length " + str(len(cmap)).encode()
         + b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n")
    form_body = b"BT /F1 10 Tf (formed) Tj ET"
    formed = plain.replace(
        b"/Contents 2 0 R >>",
        b"/Contents 2 0 R /XObject << /X1 88 0 R >> >>", 1,
    ) + (b"88 0 obj\n<< /Type /XObject /Subtype /Form /Length "
         + str(len(form_body)).encode() + b" >>\nstream\n" + form_body
         + b"\nendstream\nendobj\n")
    return {
        "pdf_classic": encode_pdf(pages),
        "pdf_plain": plain,
        "pdf_xstream": encode_pdf(pages, xref_stream=True),
        "pdf_objstm": encode_pdf(pages, xref_stream=True, objstm=True),
        "pdf_lzw": rebuild(_lzw_encode(ops), b"/Filter /LZWDecode"),
        "pdf_a85": rebuild(
            base64.a85encode(ops) + b"~>", b"/Filter /ASCII85Decode"
        ),
        "pdf_ahx_flate": rebuild(
            base64.b16encode(zlib.compress(ops)) + b">",
            b"/Filter [/ASCIIHexDecode /FlateDecode]",
        ),
        "pdf_fonts": fonty,
        "pdf_form": formed,
        "pdf_type0": encode_pdf(pages, font="type0"),
        "pdf_type0_fontprog": encode_pdf(
            pages, font="type0", to_unicode=False
        ),
        "pdf_type0_cff": encode_pdf(
            pages, font="type0", to_unicode=False, font_program="cff"
        ),
        "pdf_rc4": encode_pdf(pages, encrypt="o", encrypt_mode="rc4"),
        "pdf_rc4_40": encode_pdf(pages, encrypt="o", encrypt_mode="rc4-40"),
        "pdf_aesv2": encode_pdf(
            pages, font="type0", encrypt="o", encrypt_mode="aesv2"
        ),
        "pdf_aesv3": encode_pdf(
            pages, encrypt="o", encrypt_mode="aesv3",
            xref_stream=True, objstm=True,
        ),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    t0 = time.time()
    escapes: list[tuple] = []
    checked = 0

    def drive(target: str, payload: bytes, fns) -> None:
        nonlocal checked
        seed = zlib.crc32((target + "-campaign-r8").encode())
        rng = np.random.default_rng(seed)
        for i, mut in enumerate(_mutations(payload, rng, n)):
            for f in fns:
                checked += 1
                try:
                    f(mut)
                except ValueError:
                    pass
                except Exception as exc:  # noqa: BLE001 — the contract
                    escapes.append(
                        (target, type(exc).__name__, seed, i, str(exc)[:120])
                    )

    for kind, payload in _valid_payloads().items():
        decoder = "jpeg" if kind == "jpeg_prog" else kind
        fns = [mm.DECODERS[decoder], mm.DECODERS["auto"], probe_payload]
        drive(kind, payload, fns)
    for name, payload in _pdf_flavors().items():
        drive(name, payload, [pdf_extract_text, pdf_info, probe_payload])
    warc = synth_warc(
        [("http://x/a", b"hello body", "text/plain"),
         ("http://x/b", b"<html><p>hi</p></html>", "text/html")]
    )
    drive("warc_plain", warc, [parse_warc])
    from vectra_py_spark.operators.office import (
        encode_docx, encode_epub, encode_odt, encode_pptx, encode_xlsx,
        office_extract_text,
    )
    from vectra_py_spark.operators.doc import encode_doc
    from vectra_py_spark.operators.ppt import encode_ppt
    from vectra_py_spark.operators.rtf import encode_rtf
    from vectra_py_spark.operators.xls import encode_xls

    office_targets = {
        "doc": encode_doc(["campaign legacy body", "café 日本語"]),
        "ppt": encode_ppt([["campaign deck", "café 日本語"]]),
        "xls": encode_xls([[["campaign", "1.5", "日本"]]], sst_split=True),
        "xlsx": encode_xlsx([[["campaign", "1"], ["cells", "2.5"]]]),
        "rtf": encode_rtf(["campaign café 日本語", "second para"]),
        "docx": encode_docx(["campaign line one", "two\tthree"]),
        "pptx": encode_pptx([["slide one"], ["slide two"]]),
        "odt": encode_odt(["campaign line one"]),
        "epub": encode_epub([("t", "<p>campaign body</p>")]),
    }
    for name, payload in office_targets.items():
        drive(name, payload, [office_extract_text, probe_payload])
    drive("warc_gz", synth_warc(
        [("http://x/a", b"hello body", "text/plain")], compress=True
    ), [parse_warc])
    from vectra_py_spark.operators.truetype import (
        cmap_gid_to_unicode, encode_truetype_cmap,
    )

    drive("truetype_cmap", encode_truetype_cmap(
        {ord("a"): 1, 0x4E2D: 7, 0x1F600: 9}
    ), [cmap_gid_to_unicode])
    from vectra_py_spark.operators.cff import (
        cff_gid_to_unicode, encode_cff_charset,
    )

    drive("cff_charset", encode_cff_charset(
        ["a", "Z", "uni4E2D", "adieresis", "u1F600"]
    ), [cff_gid_to_unicode])

    # round-9 crawl-layer parsers. The text-input parsers are wrapped
    # through latin-1 (total: every byte string decodes) so byte
    # mutations exercise them; robots/boilerplate parsing is
    # total-by-design (never raises), so ANY exception is an escape
    # there, while the cdx/sitemap codecs keep the ValueError contract.
    from vectra_py_spark.operators.boilerplate import extract_main_text
    from vectra_py_spark.operators.robots import parse_robots, parse_sitemap
    from vectra_py_spark.sources.cdx import (
        format_cdxj_line, index_warc, parse_cdxj_line, surt_key,
    )

    def _txt(f):
        return lambda b: f(b.decode("latin-1"))

    cdxj_seed = format_cdxj_line({
        "surt": "org,example)/a", "ts": "20260101120000",
        "url": "https://example.org/a?x=1", "mime": "text/html",
        "status": 200, "digest": "sha1:AAAA", "filename": "seg.warc.gz",
        "offset": 345, "length": 678,
    }).encode()
    drive("cdxj_line", cdxj_seed, [_txt(parse_cdxj_line)])
    drive("surt", b"https://www.Sub.Example.org:8443/Path/x?b=2&a=1",
          [_txt(surt_key)])
    drive("warc_index", synth_warc(
        [("http://x/a", b"hello", "text/html")], compress=True
    ), [lambda b: index_warc(b, "f.warc.gz")])
    drive("sitemap", (
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://e/a</loc><lastmod>2026-01-01</lastmod></url>"
        b"</urlset>"
    ), [parse_sitemap])
    drive("robots", (
        b"User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"
        b"Crawl-delay: 2\nUser-agent: bot\nDisallow: /*.pdf$\n"
    ), [_txt(lambda s: parse_robots(s).allowed("/private/x"))])
    drive("boilerplate", (
        b"<html><body><nav><a href='/'>Home</a></nav><h1>T</h1>"
        b"<p>the quick brown committee of the and was to in it</p>"
        b"</body></html>"
    ), [_txt(extract_main_text)])
    from vectra_py_spark.operators.tables import (
        extract_tables, tables_to_markdown,
    )

    drive("tables", (
        b"<table><tr><th>A</th><th>B</th></tr>"
        b"<tr><td colspan='2'>wide &amp; x</td></tr>"
        b"<tr><td>1<td>2</table>"
    ), [_txt(extract_tables), _txt(tables_to_markdown)])
    from vectra_py_spark.operators.feeds import parse_feed

    drive("feed_rss", (
        b'<rss version="2.0"><channel><title>t</title>'
        b"<item><title>p</title><link>https://s/p</link>"
        b"<guid>g</guid></item></channel></rss>"
    ), [parse_feed])
    # round-10 byte-facing surfaces: perceptual hashing's decoder
    # dispatch (ValueError contract through phash64) and audio
    # fingerprinting through the WAV/FLAC decoders
    from vectra_py_spark.operators.audio import decode_audio_payload
    from vectra_py_spark.operators.audiofp import fingerprints
    from vectra_py_spark.operators.imagehash import (
        _decode_pixels, dhash64, phash64,
    )

    def _phash_bytes(b: bytes):
        img = _decode_pixels(b)
        return phash64(img), dhash64(img)

    def _audiofp_bytes(b: bytes):
        samples, sr, _k = decode_audio_payload(b)
        mono = samples.astype("float64").mean(axis=1) / 32768.0
        return len(fingerprints(mono, sr))

    drive("phash_ppm", mm.synth_ppm(24, 16), [_phash_bytes])
    drive("phash_jpeg", mm.encode_jpeg(mm.decode_ppm(mm.synth_ppm(24, 16))),
          [_phash_bytes])
    drive("audiofp_wav", mm.synth_wav(seconds=0.3), [_audiofp_bytes])
    # round-11: the video frame-hash dispatch (AVI/MP4/GIF walk →
    # per-frame decode → pHash) must hold the ValueError-only contract
    from vectra_py_spark.operators.avi import synth_avi
    from vectra_py_spark.operators.videohash import video_frame_hashes

    drive("videohash_avi", synth_avi(n_frames=3), [video_frame_hashes])
    drive("videohash_gif", mm.synth_gif(n_frames=3, width=16, height=12),
          [video_frame_hashes])

    drive("feed_atom", (
        b'<feed xmlns="http://www.w3.org/2005/Atom"><title>t</title>'
        b'<entry><title>a</title><link rel="alternate" href="https://b/a"/>'
        b"<id>i</id></entry></feed>"
    ), [parse_feed])

    # round-11: the subtitle block scanner is total over text (never
    # raises for any str) — ANY exception on decoded bytes is an escape
    from vectra_py_spark.operators.subtitles import parse_cues

    drive("subtitles_srt", (
        b"1\n00:00:01,000 --> 00:00:02,500\nfirst cue line\n\n"
        b"2\n00:00:03,000 --> 00:00:04,000\nsecond\nwrapped\n"
    ), [_txt(parse_cues)])
    drive("subtitles_vtt", (
        b"WEBVTT\n\nNOTE c\n\ncue-1\n00:01.000 --> 00:02.000 align:start\n"
        b"<c>tagged</c> <00:00:01.500>karaoke text\n"
    ), [_txt(parse_cues)])

    print(json.dumps({
        "mutations_per_target": n,
        "targets": 10 + len(_pdf_flavors()) + 9 + 4 + 9 + 3 + 2 + 2,
        "total_calls": checked,
        "wall_s": round(time.time() - t0, 1),
        "escapes": escapes[:50],
        "n_escapes": len(escapes),
    }), flush=True)


if __name__ == "__main__":
    main()
