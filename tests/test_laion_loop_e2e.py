"""The closed LAION acquisition loop (VERDICT r11 item 4): mine
(image_url, caption) pairs from HTML → pre-fetch pair dedup → polite
per-host fetch schedule → fetch (deterministic injected transport —
the container has no network) → pHash near-dup → canonical corpus.
One pipeline (`operators/pairs.py::mine_image_corpus`), with the
bytes-touched bound asserted the media-e2e way: every unique image URL
is fetched EXACTLY once no matter how many pages/pairs reference it,
junk URLs quarantine as error rows, and the perceptual dedup keeps one
payload per image while folding the dropped copy's captions into the
canonical representative."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from vectra_py_spark.operators.pairs import mine_image_corpus

pytestmark = pytest.mark.slow  # excluded from the smoke tier

N_BASES = 4          # distinct images
W = H = 32


def _ppm(base: int, noisy: bool) -> bytes:
    yy, xx = np.mgrid[0:H, 0:W]
    rng = np.random.default_rng(80_000 + base)
    img = np.zeros((H, W))
    for _ in range(4):
        cy, cx = rng.uniform(0, H), rng.uniform(0, W)
        amp, sig = rng.uniform(60, 140), rng.uniform(3, 8)
        img += amp * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2)
        )
    if noisy:
        n = np.random.default_rng(81_000 + base)
        img = img + n.integers(-1, 2, size=img.shape)
    g = np.clip(img, 0, 255).astype(np.uint8)
    rgb = np.stack([g, g, g], axis=2)
    return b"P6\n%d %d\n255\n" % (W, H) + rgb.tobytes()


# URL space: per base, a canonical URL on cdn-a and a near-identical
# mirror on cdn-b (pixel noise — pHash must pair them); cdn-a also
# serves one URL the transport cannot resolve (fetch quarantine).
IMAGES = {}
for b in range(N_BASES):
    IMAGES[f"http://cdn-a.example/img/{b}.ppm"] = _ppm(b, noisy=False)
    IMAGES[f"http://cdn-b.example/mirror/{b}.ppm"] = _ppm(b, noisy=True)
DEAD_URL = "http://cdn-a.example/img/missing.ppm"


def _make_transport(images: dict):
    """Closure transport — cloudpickle ships it by VALUE, so executors
    never need to import this test module."""

    def transport(url: str):
        if url not in images:
            raise KeyError(f"404: {url}")
        return images[url], "image/x-portable-pixmap"

    return transport


def _pages(spark):
    """HTML pages: every (url, caption) pair appears on SEVERAL pages
    (the dedup must collapse that before any fetch); gate chaff (no
    alt, short alt, data: URI) is planted on each page."""
    rows = []
    for p in range(12):
        b = p % N_BASES
        mirror = f"http://cdn-b.example/mirror/{b}.ppm"
        html = (
            f'<p>page {p}</p>'
            f'<img src="http://cdn-a.example/img/{b}.ppm" '
            f'alt="a photo of subject {b}">'
            f"<img src='{mirror}' alt='mirrored picture of subject {b}'>"
            f'<img src="http://cdn-a.example/img/{b}.ppm" alt="x">'
            f'<img src="data:image/gif;base64,AAAA" alt="inline junk">'
            f'<img src="/img/nofetch.ppm">'
        )
        if p == 0:
            html += f'<img src="{DEAD_URL}" alt="a dead reference link">'
        rows.append((f"http://pages.example/p{p:02d}.html", html))
    return spark.createDataFrame(rows, ["url", "text"])


def test_laion_loop_e2e(spark):
    stages = mine_image_corpus(
        _pages(spark), transport=_make_transport(dict(IMAGES)),
        # tiny delay: the schedule SHAPE is asserted below; pacing is
        # now actually enforced (r12), its wall tested in test_pairs
        n_workers=3, default_delay=0.05, radius=7,
    )

    # 1) MINE + PAIR DEDUP: 12 pages × 2 good tags + 1 dead ref mined;
    #    chaff (short alt, data: URI, missing alt) never enters.
    n_mined = stages["pairs"].count()
    assert n_mined == 12 * 2 + 1
    uniq = stages["unique_pairs"].collect()
    assert len(uniq) == 2 * N_BASES + 1  # one row per (url, caption)
    assert all(r.n_pages == (12 // N_BASES) for r in uniq
               if r.image_url != DEAD_URL)

    # 2) SCHEDULE: per-host slots serialize politely and each host
    #    pins to one worker.
    sched = stages["schedule"].collect()
    by_host: dict = {}
    for r in sched:
        by_host.setdefault(r.host, []).append(r)
    assert set(by_host) == {"cdn-a.example", "cdn-b.example"}
    for host, rows in by_host.items():
        slots = sorted(r.slot for r in rows)
        assert slots == list(range(1, len(rows) + 1))
        assert all(r.fetch_at_s == (r.slot - 1) * 0.05 for r in rows)
        assert len({r.worker for r in rows}) == 1  # host → ONE worker

    # 3) FETCH with the BYTES-TOUCHED BOUND: one fetch per unique URL
    #    (pairs referenced each URL from 12 pages; the transport sees
    #    it once), dead URL quarantined as a row, exact byte totals.
    fetched = stages["fetched"].collect()
    assert len(fetched) == 2 * N_BASES + 1
    ok = [r for r in fetched if r.fetch_error is None]
    dead = [r for r in fetched if r.fetch_error is not None]
    assert [r.image_url for r in dead] == [DEAD_URL]
    assert "KeyError" in dead[0].fetch_error
    got_urls = sorted(r.image_url for r in ok)
    assert got_urls == sorted(IMAGES)  # each URL exactly once
    assert sum(len(bytes(r.payload)) for r in ok) == sum(
        len(v) for v in IMAGES.values()
    )

    # 4) PERCEPTUAL DEDUP: each cdn-a original pairs with its cdn-b
    #    mirror and nothing else; canonical = min URL (cdn-a).
    pairs = {(p.id_a, p.id_b) for p in stages["neardup_pairs"].collect()}
    want = {
        (f"http://cdn-a.example/img/{b}.ppm",
         f"http://cdn-b.example/mirror/{b}.ppm")
        for b in range(N_BASES)
    }
    assert pairs == want
    canon = {r.image_url: r.canonical_url
             for r in stages["canonical"].collect()}
    for b in range(N_BASES):
        a = f"http://cdn-a.example/img/{b}.ppm"
        m = f"http://cdn-b.example/mirror/{b}.ppm"
        assert canon[a] == a and canon[m] == a

    # 5) CORPUS: one payload per perceptual image, the mirror's caption
    #    folded into the canonical URL, the dead URL gone.
    corpus = stages["corpus"].collect()
    urls_out = {r.image_url for r in corpus}
    assert urls_out == {
        f"http://cdn-a.example/img/{b}.ppm" for b in range(N_BASES)
    }
    by_url: dict = {}
    for r in corpus:
        by_url.setdefault(r.image_url, set()).add(r.caption)
        assert bytes(r.payload) == IMAGES[r.image_url]
    for b in range(N_BASES):
        assert by_url[f"http://cdn-a.example/img/{b}.ppm"] == {
            f"a photo of subject {b}",
            f"mirrored picture of subject {b}",
        }
