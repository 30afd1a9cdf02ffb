"""Image-text pair mining from crawled HTML — the LAION recipe
(Schuhmann et al. 2021, "LAION-400M: Open Dataset of CLIP-Filtered
400 Million Image-Text Pairs"): every ``<img>`` tag whose ``alt``
text survives a quality gate becomes a candidate (image_url, caption)
training pair. This is how the public web-scale image-text corpora
(LAION, and the same construction in WebLI / DataComp) are built from
Common Crawl, and it is the multimodal sibling of this repo's
bitext mining: acquisition produces CANDIDATE pairs cheaply; dedup
and similarity filtering (phash_neardup_pairs, embedding cosine)
provide the wide ops downstream. Reference tie-in: the reference's
fetch→extract path (document_fetcher.py) keeps only page text; this
operator keeps the image-caption structure that path discards.

Implementation is PURE CATALYST: ``regexp_extract_all`` collects the
``<img ...>`` tags (one codegen'd pass over the page), ``posexplode``
makes one row per tag, and per-tag attribute extraction, entity
unescape, URL resolution, and the alt-quality gate are all column
expressions — caption mining for 10^10 pages is one narrow generator
pass, no Python, no shuffle. The only wide op is the OPTIONAL
corpus-level dedup (:func:`dedup_image_text_pairs`), a hash
aggregation on (image_url, caption).

URL resolution covers the four forms that dominate real markup
(absolute http/https, protocol-relative ``//host/p``, root-relative
``/p``, and directory-relative ``p``); ``..`` dot segments are kept
literally (documented simplification — ``outlinks_df`` in
linkgraph.py is the urljoin-exact path when a frontier needs it).
``data:`` / ``javascript:`` and other non-http schemes are dropped.

The alt-quality gate is the published one: alt present, length within
[min_alt_chars, max_alt_chars] after trimming, and (optionally) not a
bare image filename — the "IMG_1234.jpg" alts that caption nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "image_text_pairs_df",
    "dedup_image_text_pairs",
]

_IMG_TAG = r"(?is)<img\b[^>]*>"
# attribute value, one pattern per quote style so a mismatched quote
# cannot span attributes; (?<![\w-]) keeps `data-src` from matching
_SRC_DQ = r"""(?is)(?<![\w-])src\s*=\s*"([^"]*)\""""
_SRC_SQ = r"(?is)(?<![\w-])src\s*=\s*'([^']*)'"
_ALT_DQ = r"""(?is)(?<![\w-])alt\s*=\s*"([^"]*)\""""
_ALT_SQ = r"(?is)(?<![\w-])alt\s*=\s*'([^']*)'"
_FILENAMEY = r"(?i)^[\w ./-]*\.(jpe?g|png|gif|webp|bmp|svg|tiff?)$"


def _unescape5(c: Column) -> Column:
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),  # amp LAST (double-escapes)
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _attr(tag: Column, dq: str, sq: str) -> Column:
    got = F.coalesce(
        F.nullif(F.regexp_extract(tag, dq, 1), F.lit("")),
        F.nullif(F.regexp_extract(tag, sq, 1), F.lit("")),
    )
    return got


def _resolve_src(src: Column, page_url: Column) -> Column:
    """Absolute URL for ``src`` against ``page_url`` — Catalyst CASE
    over the four common reference forms; non-http(s) schemes → NULL."""
    page = F.regexp_replace(page_url, r"[?#].*$", "")
    origin = F.regexp_extract(page, r"^([A-Za-z][\w+.-]*://[^/?#]+)", 1)
    scheme = F.regexp_extract(page, r"^([A-Za-z][\w+.-]*):", 1)
    path_dir = F.regexp_extract(page, r"^[A-Za-z][\w+.-]*://[^/?#]+(.*/)", 1)
    base = F.concat(
        origin,
        F.when(path_dir == "", F.lit("/")).otherwise(path_dir),
    )
    has_scheme = src.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
    is_http = src.rlike(r"(?i)^https?://")
    return (
        F.when(src.startswith("//"), F.concat(scheme, F.lit(":"), src))
        .when(is_http, src)
        .when(has_scheme, F.lit(None))  # data:, javascript:, mailto:
        .when(src.startswith("/"), F.concat(origin, src))
        .otherwise(F.concat(base, src))
    )


def image_text_pairs_df(
    df: DataFrame,
    html_col: str = "text",
    url_col: str = "url",
    min_alt_chars: int = 5,
    max_alt_chars: int = 1000,
    drop_filenamey: bool = True,
) -> DataFrame:
    """(page url, html) rows → one row per surviving ``<img>`` tag:
    (page_url, img_idx, image_url, caption, caption_words).

    ``img_idx`` is the tag's position among ALL img tags on the page
    (including ones the gate later drops) so a pair is traceable back
    to its markup. ``caption`` is the entity-unescaped, trimmed alt
    text; ``caption_words`` its whitespace token count — the cheap
    quality signal downstream mixers weight by.

    One narrow codegen'd projection + generator; nothing shuffles.
    """
    h = F.col(html_col)
    tags = F.regexp_extract_all(h, F.lit(_IMG_TAG), 0)
    exploded = df.select(
        F.col(url_col).alias("page_url"),
        F.posexplode(tags).alias("img_idx", "tag"),
    )
    src = _attr(F.col("tag"), _SRC_DQ, _SRC_SQ)
    alt = F.trim(_unescape5(
        F.coalesce(
            F.nullif(F.regexp_extract(F.col("tag"), _ALT_DQ, 1), F.lit("")),
            F.nullif(F.regexp_extract(F.col("tag"), _ALT_SQ, 1), F.lit("")),
        )
    ))
    out = exploded.select(
        "page_url",
        "img_idx",
        _resolve_src(src, F.col("page_url")).alias("image_url"),
        alt.alias("caption"),
    ).where(
        F.col("image_url").isNotNull()
        & F.col("caption").isNotNull()
        & (F.length("caption") >= min_alt_chars)
        & (F.length("caption") <= max_alt_chars)
    )
    if drop_filenamey:
        out = out.where(~F.col("caption").rlike(_FILENAMEY))
    return out.select(
        "page_url", "img_idx", "image_url", "caption",
        F.size(F.split(F.col("caption"), r"\s+")).alias("caption_words"),
    )


def dedup_image_text_pairs(pairs: DataFrame) -> DataFrame:
    """Corpus-level exact pair dedup — the step LAION runs before any
    image fetch: the same (image_url, caption) pair appears on many
    pages (headers, product grids, mirrors), and fetching the image
    once is the entire point. One hash aggregation on the pair key;
    keeps the lexicographically-first page as provenance.

    Near-dup of the IMAGES behind the URLs is downstream
    (phash_neardup_pairs after fetch); near-dup of captions is
    minhash/simhash on the caption column.
    """
    return pairs.groupBy("image_url", "caption").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.min("page_url").alias("first_page"),
        F.max("caption_words").alias("caption_words"),
    )
