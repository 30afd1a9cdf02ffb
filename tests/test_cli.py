"""D9 CLI verbs end-to-end (create → add → stats → query → remove)."""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

from vectra_py_spark.cli import _expand_uris, _build_parser, main

import pytest

pytestmark = pytest.mark.slow  # excluded from the smoke tier


def run(capsys, *argv) -> list[dict]:
    assert main(list(argv)) == 0
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(ln) for ln in out if ln.startswith("{")]


def test_cli_lifecycle(spark, capsys, tmp_path):
    idx = str(tmp_path / "idx")
    doc = tmp_path / "note.md"
    doc.write_text(
        "# Spark notes\n\nShuffle partitions control parallelism.\n\n"
        "Broadcast joins avoid shuffles for small tables.\n"
    )
    run(capsys, "--index", idx, "create")
    added = run(capsys, "--index", idx, "add", "--uri", str(doc))
    assert added[-1] == {"added": 1}
    stats = run(capsys, "--index", idx, "stats")[-1]
    assert stats["documents"] == 1 and stats["chunks"] >= 1
    hits = run(
        capsys, "--index", idx, "query", "broadcast shuffle", "--format", "chunks"
    )
    assert hits and hits[0]["uri"] == str(doc)
    secs = run(capsys, "--index", idx, "query", "broadcast shuffle")
    assert secs and "Broadcast" in secs[0]["text"] or secs[0]["token_count"] > 0
    run(capsys, "--index", idx, "remove", "--uri", str(doc))
    stats = run(capsys, "--index", idx, "stats")[-1]
    assert stats["documents"] == 0 and stats["chunks"] == 0


def test_expand_uris_lines_and_filings_json(tmp_path):
    lines = tmp_path / "uris.txt"
    lines.write_text("a.md\n\nb.md\n")
    filings = tmp_path / "filings.json"
    filings.write_text(json.dumps({"filings": [{"url": "http://x/1"}, {"no": 1}]}))
    p = _build_parser()
    a1 = p.parse_args(["--index", "i", "add", "--list", str(lines)])
    assert _expand_uris(a1) == ["a.md", "b.md"]
    a2 = p.parse_args(["--index", "i", "add", "--uri", "c.md", "--list", str(filings)])
    assert _expand_uris(a2) == ["c.md", "http://x/1"]


def test_cli_export_verb(spark, capsys, tmp_path):
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "shards")
    run(capsys, "--index", idx, "create")
    for i in range(6):
        doc = tmp_path / f"d{i}.md"
        doc.write_text(f"# Doc {i}\n\ncontent body number {i} for export\n")
        run(capsys, "--index", idx, "add", "--uri", str(doc))
    manifest = run(
        capsys, "--index", idx, "export", out, "--shards", "4"
    )[-1]
    assert manifest["total_rows"] == 6 and manifest["n_shards"] == 4
    rows = spark.read.parquet(out).count()
    assert rows == 6


def test_cli_ingest_folder_verb(spark, capsys, tmp_path):
    """ingest-folder: one verb turns a mixed drop directory into a
    queryable index — magic-byte dispatch, not extensions."""
    from vectra_py_spark.operators.doc import encode_doc
    from vectra_py_spark.operators.pdf import encode_pdf
    from vectra_py_spark.operators.rtf import encode_rtf

    idx = str(tmp_path / "idx")
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "memo.rtf").write_bytes(
        encode_rtf(["quarterly revenue memo discusses targets"])
    )
    (drop / "paper.pdf").write_bytes(
        encode_pdf([["gardening tips for tomato plants"]])
    )
    # extension lies: a legacy .doc named .txt still lands as doc
    (drop / "legacy.txt").write_bytes(
        encode_doc(["ancient word processor text"])
    )
    (drop / "junk.bin").write_bytes(bytes(range(256)) * 8)
    run(capsys, "--index", idx, "create")
    out = run(capsys, "--index", idx, "ingest-folder", str(drop))[-1]
    assert out["ingested"] == 3
    assert out["by_type"] == {"rtf": 1, "pdf": 1, "doc": 1}
    stats = run(capsys, "--index", idx, "stats")[-1]
    assert stats["documents"] == 3
    hits = run(
        capsys, "--index", idx, "query", "quarterly revenue targets",
        "--format", "chunks", "--document-count", "1",
    )
    assert hits and hits[0]["uri"].endswith("memo.rtf")


def test_cli_ingest_archives_verb(spark, capsys, tmp_path):
    """ingest-archives: a TAR of mixed documents lands as a queryable
    index in one verb — the packed-small-files shape."""
    import io
    import tarfile

    from vectra_py_spark.operators.pdf import encode_pdf
    from vectra_py_spark.operators.rtf import encode_rtf

    idx = str(tmp_path / "idx")
    drop = tmp_path / "bundles"
    drop.mkdir()
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as t:
        for name, data in {
            "memo.rtf": encode_rtf(["archived memo about shipping revenue"]),
            "paper.pdf": encode_pdf([["archived paper on tomato plants"]]),
            "junk.bin": bytes(range(256)) * 8,
        }.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    (drop / "b.tar.gz").write_bytes(tbuf.getvalue())
    run(capsys, "--index", idx, "create")
    out = run(capsys, "--index", idx, "ingest-archives", str(drop))[-1]
    assert out["ingested"] == 2
    assert out["by_type"] == {"rtf": 1, "pdf": 1}
    stats = run(capsys, "--index", idx, "stats")[-1]
    assert stats["documents"] == 2
    hits = run(
        capsys, "--index", idx, "query", "shipping revenue memo",
        "--format", "chunks", "--document-count", "1",
    )
    assert hits and hits[0]["uri"].endswith("memo.rtf")


def test_cli_dedup_media_verb(spark, capsys, tmp_path):
    """dedup-media over a mixed folder: duplicate PPMs pair up, the
    trimmed audio copy matches, junk files quarantine silently."""
    import numpy as np

    from vectra_py_spark.operators import multimodal as mm
    from vectra_py_spark.operators.audio import encode_audio_payload

    media = tmp_path / "media"
    media.mkdir()
    ppm = mm.synth_ppm(40, 24)
    (media / "a.ppm").write_bytes(ppm)
    (media / "a_copy.ppm").write_bytes(ppm)
    (media / "other.ppm").write_bytes(mm.synth_ppm(24, 40))
    sr = 8000
    rng = np.random.default_rng(8)
    t = np.arange(3 * sr) / sr
    f0, f1 = 400.0, 2400.0
    x = 0.5 * np.sin(2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * t[-1])))
    pcm = (x * 32767).astype(np.int64)[:, None]
    (media / "clip.wav").write_bytes(encode_audio_payload(pcm, sr, "wav"))
    (media / "clip_cut.wav").write_bytes(
        encode_audio_payload(pcm[8 * 512:], sr, "wav")
    )
    (media / "junk.bin").write_bytes(b"not media at all")
    # a video + a 2-frame trim of it: invisible to the image lane's
    # first-frame hash, caught by the video lane's offset alignment
    from vectra_py_spark.operators.avi import encode_avi_mjpeg
    from vectra_py_spark.operators.jpeg import encode_jpeg

    vf = [
        encode_jpeg(
            np.clip(
                np.random.default_rng(300 + i).normal(128, 40, (16, 24)),
                0, 255,
            ).astype(np.uint8),
            quality=85,
        )
        for i in range(6)
    ]
    (media / "vid.avi").write_bytes(encode_avi_mjpeg(vf, 24, 16))
    (media / "vid_cut.avi").write_bytes(encode_avi_mjpeg(vf[2:], 24, 16))

    # no --index: dedup-media is a pure folder scan (ADVICE r10)
    out = run(
        capsys,
        "dedup-media", "--path", str(media), "--min-matches", "40",
    )[-1]
    assert out["images_hashed"] == 5         # 3 PPMs + 2 AVI first frames
    assert out["audio_fingerprinted"] == 2
    assert out["audio_copy_pairs"] == 1      # the trimmed clip
    assert out["videos_fingerprinted"] == 2
    assert out["video_copy_pairs"] == 1      # the 2-frame trim
    # image lane: the exact PPM copy, plus the videos' shared first
    # frames if the trim left them near — count only the PPM pair
    assert out["image_neardup_pairs"] >= 1


def test_cli_index_required_for_index_verbs(spark, capsys):
    """Every verb except dedup-media still demands --index, with a
    clear error instead of a crash."""
    assert main(["stats"]) == 2
    err = capsys.readouterr().err
    assert "--index is required" in err


def test_cli_mine_pairs_verb(spark, capsys, tmp_path):
    """mine-pairs over an HTML folder: captions mined, duplicates
    collapsed in the deduped table, relative srcs resolved against
    the page's own file URL, parquet written when --out is given."""
    site = tmp_path / "site"
    site.mkdir()
    block = '<img src="shared.png" alt="the same caption on two pages">'
    (site / "a.html").write_text(
        f"<html><body>{block}"
        '<img src="https://cdn.example/x.jpg" alt="unique caption A">'
        "</body></html>"
    )
    (site / "b.html").write_text(f"<html><body>{block}</body></html>")
    (site / "junk.html").write_text("<html><body>no images</body></html>")
    out_dir = tmp_path / "pairs"

    out = run(
        capsys,
        "mine-pairs", "--path", str(site), "--out", str(out_dir),
    )[-1]
    assert out["pairs_mined"] == 3
    assert out["pairs_unique"] == 2
    got = spark.read.parquet(str(out_dir)).collect()
    by_cap = {r.caption: r for r in got}
    assert by_cap["the same caption on two pages"].n_pages == 2
    # relative srcs resolved against the page's own directory —
    # except the SAME filename on two pages: both resolve to one URL
    assert by_cap["the same caption on two pages"].image_url.endswith(
        "/site/shared.png"
    )
    assert by_cap["unique caption A"].image_url == "https://cdn.example/x.jpg"


def test_cli_mine_images_verb(spark, capsys, tmp_path):
    """mine-images: the full LAION loop from the CLI with the hermetic
    --image-root transport — mine, dedup, fetch each unique URL once,
    pHash-collapse the near-identical mirror, write the corpus."""
    import numpy as np

    site = tmp_path / "site"
    site.mkdir()
    images = tmp_path / "images"
    images.mkdir()

    yy, xx = np.mgrid[0:32, 0:32]
    rng = np.random.default_rng(7)
    img = np.zeros((32, 32))
    for _ in range(4):
        cy, cx = rng.uniform(0, 32), rng.uniform(0, 32)
        img += rng.uniform(60, 140) * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rng.uniform(3, 8) ** 2)
        )
    g = np.clip(img, 0, 255).astype(np.uint8)
    noisy = np.clip(
        img + np.random.default_rng(8).integers(-1, 2, size=img.shape),
        0, 255,
    ).astype(np.uint8)

    def ppm(a):
        return b"P6\n32 32\n255\n" + np.stack([a, a, a], axis=2).tobytes()

    (images / "orig.ppm").write_bytes(ppm(g))
    (images / "mirror.ppm").write_bytes(ppm(noisy))

    html = (
        '<img src="http://cdn.example/a/orig.ppm" alt="a cat on a mat">'
        '<img src="http://mirror.example/b/mirror.ppm" '
        'alt="the same cat, mirrored host">'
        '<img src="http://cdn.example/a/dead.ppm" alt="gone forever link">'
    )
    (site / "p1.html").write_text(f"<html><body>{html}</body></html>")
    (site / "p2.html").write_text(f"<html><body>{html}</body></html>")
    out_dir = tmp_path / "corpus"

    out = run(
        capsys,
        "mine-images", "--path", str(site),
        "--image-root", str(images), "--out", str(out_dir),
        "--workers", "2",
    )[-1]
    assert out["urls_fetched"] == 3
    assert out["fetch_errors"] == 1          # dead.ppm quarantined
    assert out["canonical_images"] == 1      # mirror pHash-collapsed
    assert out["corpus_rows"] == 2           # both captions kept
    assert out["bytes_fetched"] == len(ppm(g)) + len(ppm(noisy))
    got = spark.read.parquet(str(out_dir)).collect()
    assert {r.caption for r in got} == {
        "a cat on a mat", "the same cat, mirrored host",
    }
    # canonical representative = min URL; every row carries its bytes
    assert all(
        r.image_url == "http://cdn.example/a/orig.ppm" for r in got
    )
    assert all(bytes(r.payload) == ppm(g) for r in got)
    # each (url, caption) pair appeared on both pages → n_pages == 2
    assert all(r.n_pages == 2 for r in got)
