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


def url_host(col) -> Column:
    """Lowercased host of an absolute http(s) URL (NULL if unparsable)."""
    return F.lower(F.try_parse_url(F.trim(col), F.lit("HOST")))


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host: ``a.b.example.com`` →
    [a.b.example.com, b.example.com, example.com, com] — the candidate
    keys for domain-level blocklist matching (a blocklist entry blocks
    its whole subdomain tree)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n), "."),
    )


def blocked_host_set(df, url_col: str, blocklist_df) -> "DataFrame":
    """(host) — the distinct hosts of ``df`` that match the blocklist
    (exact host or any parent domain). The suffix-explode runs over
    DISTINCT hosts only (≪ row count: ~10^7 hosts in a 10^10-page
    crawl), and the blocklist side broadcasts."""
    hosts = (
        df.select(url_host(F.col(url_col)).alias("host"))
        .where(F.col("host").isNotNull())
        .distinct()
    )
    bl = F.broadcast(blocklist_df.select(F.lower(blocklist_df.columns[0]).alias("_sfx")).distinct())
    return (
        hosts.select("host", F.explode(host_suffixes(F.col("host"))).alias("_sfx"))
        .join(bl, "_sfx", "left_semi")
        .select("host")
        .distinct()
    )


def blocklist_filter(df, url_col: str, blocklist_df) -> "DataFrame":
    """Crawl-curation domain blocklist: drop every row whose URL host is
    a blocked domain or lives under one (``example.com`` blocks
    ``a.b.example.com``); rows with unparsable hosts are KEPT (policy:
    the blocklist names domains, a URL with no host matches none).

    Scale shape: blocked-host set = distinct-host suffix probe against
    the broadcast blocklist; the full table then anti-joins that (small,
    broadcast) set on its host — row data never shuffles.
    """
    blocked = blocked_host_set(df, url_col, blocklist_df)
    return df.join(
        F.broadcast(blocked),
        url_host(df[url_col]) == blocked["host"],
        "left_anti",
    )
