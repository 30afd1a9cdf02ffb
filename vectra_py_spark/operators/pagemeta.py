"""Page-metadata extraction — the head-section fields a crawl
pipeline reads before (or instead of) the body: ``<title>``, meta
description, OpenGraph title/description, ``<link rel=canonical>``
(the SITE'S OWN canonical-URL declaration — a dedup signal that
collapses spelling variants `canonical_url` cannot know about, e.g.
print views and mobile subdomains), ``<meta name=robots>`` noindex
(pages that ASK to stay out of the corpus), and the ``<html lang>``
declaration (a language-ID prior that costs nothing).

Implementation is PURE CATALYST — one ``regexp_extract`` per field
over the raw HTML plus a bounded entity-unescape (the five
XML-predefined entities; full numeric unescape lives in the Python
extractors), so the whole projection runs inside whole-stage codegen
and scales like any column op: metadata for 10^10 pages is one narrow
pass, no Python anywhere. Attribute order is handled by alternation
(name-then-content and content-then-name both match), quotes single
or double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["page_metadata_df", "meta_content_expr"]


def _unescape5(c: Column) -> Column:
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),  # amp LAST (double-escapes)
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _first_group(html: Column, pattern: str) -> Column:
    got = F.regexp_extract(html, pattern, 1)
    return F.when(got == "", F.lit(None)).otherwise(F.trim(got))


def meta_content_expr(html: Column, name_attr: str, name: str) -> Column:
    """``<meta {name_attr}="{name}" content="...">`` with either
    attribute order and either quote style → content (NULL if
    absent)."""
    fwd = (
        rf"""(?is)<meta\s[^>]*{name_attr}\s*=\s*["']{name}["']"""
        rf"""[^>]*content\s*=\s*["']([^"']*)["']"""
    )
    rev = (
        rf"""(?is)<meta\s[^>]*content\s*=\s*["']([^"']*)["']"""
        rf"""[^>]*{name_attr}\s*=\s*["']{name}["']"""
    )
    return F.coalesce(
        _first_group(html, fwd), _first_group(html, rev)
    )


def page_metadata_df(
    df: DataFrame, html_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """(url, html) rows → (url, title, description, canonical,
    og_title, og_description, lang, noindex): one codegen'd
    projection. ``canonical`` is the href of ``<link rel=canonical>``
    — group by ``coalesce(canonical, canonical_url(url))`` for
    site-declared dedup; ``noindex`` is True when a robots meta lists
    it (corpus builders honor it the way fetchers honor robots.txt)."""
    h = F.col(html_col)
    title = _first_group(h, r"(?is)<title[^>]*>(.*?)</title\s*>")
    canonical = F.coalesce(
        _first_group(
            h,
            r"""(?is)<link\s[^>]*rel\s*=\s*["']canonical["']"""
            r"""[^>]*href\s*=\s*["']([^"']*)["']""",
        ),
        _first_group(
            h,
            r"""(?is)<link\s[^>]*href\s*=\s*["']([^"']*)["']"""
            r"""[^>]*rel\s*=\s*["']canonical["']""",
        ),
    )
    lang = _first_group(
        h, r"""(?is)<html\s[^>]*lang\s*=\s*["']([A-Za-z-]+)["']"""
    )
    robots_meta = meta_content_expr(h, "name", "robots")
    return df.select(
        F.col(url_col).alias("url"),
        _unescape5(title).alias("title"),
        _unescape5(
            meta_content_expr(h, "name", "description")
        ).alias("description"),
        canonical.alias("canonical"),
        _unescape5(
            meta_content_expr(h, "property", "og:title")
        ).alias("og_title"),
        _unescape5(
            meta_content_expr(h, "property", "og:description")
        ).alias("og_description"),
        F.lower(lang).alias("lang"),
        F.coalesce(
            F.lower(robots_meta).contains("noindex"), F.lit(False)
        ).alias("noindex"),
    )
