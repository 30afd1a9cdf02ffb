"""URL canonicalization for crawl dedup — pure Catalyst column
expressions, zero Python in the hot path.

At crawl scale the same page arrives under many spellings: scheme/host
case, a ``www.`` prefix, an explicit default port, a trailing slash,
tracker query parameters (``utm_*``/``fbclid``/``gclid``), shuffled
parameter order, and fragments. Exact text dedup catches the bodies;
canonical-URL dedup catches them BEFORE fetch/extract, which is the
cheap place. The rules here are the standard conservative set (RFC
3986 §6 syntax-based normalization plus the tracker-param strip every
crawl pipeline applies):

- scheme and host lowercase; a leading ``www.`` dropped
- explicit default port dropped (``:80`` for http, ``:443`` for
  https); non-default ports kept
- one trailing slash stripped from the path (``/a/b/`` == ``/a/b``;
  a bare ``/`` root collapses to empty)
- query parameters: empties and trackers dropped, the rest sorted
  bytewise (raw ``k=v`` strings), rejoined with ``&``
- fragment dropped

Everything is built from `try_parse_url` + array higher-order functions,
so it runs inside whole-stage codegen and scales like any projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url", "url_dedup", "host_of"]

# prefixes (trailing '_' meaningful) and exact names to strip
_TRACKER_PREFIXES = ("utm_",)
_TRACKER_EXACT = ("fbclid", "gclid", "msclkid", "ref")


def canonical_url(url: Column | str) -> Column:
    """Messy URL column → canonical string (NULL for unparseable
    input — `try_parse_url` yields NULL on non-URLs, so junk rows drop out
    of a dedup join instead of colliding on a garbage key)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.split(u, "#").getItem(0)  # fragment off before parsing

    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    authority = F.try_parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    hostport = F.when(default_port, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )

    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/$", "")

    query = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    from functools import reduce

    def _tracker(p: Column) -> Column:
        terms = [p.startswith(pre) for pre in _TRACKER_PREFIXES]
        terms += [
            p.startswith(name + "=") | (p == name)
            for name in _TRACKER_EXACT
        ]
        return reduce(lambda a, b: a | b, terms)

    params = F.filter(
        F.split(query, "&"), lambda p: (p != "") & ~_tracker(p)
    )
    qs = F.array_join(F.array_sort(params), "&")

    return F.when(
        scheme.isNull() | host.isNull(), F.lit(None)
    ).otherwise(
        F.concat(
            scheme, F.lit("://"), hostport, path,
            F.when(qs == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), qs)
            ),
        )
    )


def host_of(url: Column | str) -> Column:
    """URL column → canonical host (lowercase, leading ``www.``
    dropped, NULL for unparseable input) — the grouping key the
    host-level link graph and per-host crawl policies share."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def url_dedup(df, url_col: str = "url", keep: str = "min"):
    """Canonical-URL dedup: one surviving row per canonical URL —
    (canonical_url, n_variants, keep_<url_col>) with the bytewise
    min/max ORIGINAL spelling as the survivor (deterministic without
    a window). One hash aggregate; unparseable URLs (NULL canonical)
    are dropped, not grouped together."""
    if keep not in ("min", "max"):
        raise ValueError(f"keep must be min|max, got {keep!r}")
    agg = F.min if keep == "min" else F.max
    return (
        df.withColumn("canonical_url", canonical_url(url_col))
        .filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            agg(F.col(url_col)).alias(f"keep_{url_col}"),
        )
    )
