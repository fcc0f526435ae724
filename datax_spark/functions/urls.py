"""URL canonicalization — the crawl-dedup key for web corpora.

The same page arrives under many spellings (scheme/host case, trailing
slashes, shuffled query parameters, fragments, tracking params); a
crawl pipeline dedups and keys its CDC MERGE by the CANONICAL form.
Rules here follow the common normalization core (RFC 3986 §6 syntax-
based normalization + the usual crawl conventions):

- scheme and host lowercase; userinfo and port dropped
- fragment dropped
- trailing slashes stripped from the path ('' and '/' equal)
- query parameters sorted bytewise; empty query dropped
- ``strip_params``: remove listed keys (utm_* style tracking) before
  sorting

All JVM expressions (``parse_url`` + array ops) — a zero-shuffle
codegen projection usable inside the merge key path. DataX has no URL
handling (BytesColumn/StringColumn only) — engine-added surface.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def canonicalize_url(col, strip_params: list[str] | None = None) -> Column:
    """Canonical form of an absolute http(s) URL (NULL for NULL input;
    malformed URLs come back as parse_url sees them — garbage keys
    dedup against identical garbage, which is the right behavior for a
    dedup key)."""
    u = F.trim(col)
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    path = F.regexp_replace(F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")), "/+$", "")
    query = F.try_parse_url(u, F.lit("QUERY"))
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    if strip_params:
        keep = params
        for key in strip_params:
            keep = F.filter(keep, lambda p: ~p.startswith(key + "="))
        params = keep
    sorted_q = F.array_join(F.array_sort(params), "&")
    q_part = F.when(query.isNull() | (sorted_q == ""), F.lit("")) \
              .otherwise(F.concat(F.lit("?"), sorted_q))
    return F.when(
        scheme.isNull() | host.isNull(), u  # not an absolute URL: pass through
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, q_part))
