"""Deterministic synthetic web-page + change-event generator.

The Spark-first analogue of DataX's ``streamreader`` synthetic source
(``streamreader/.../StreamReader.java:222-231`` generate loop, ``241-307``
per-type value synthesis): instead of per-channel Java loops, a single
``spark.range(n)`` whose every derived column is a *pure deterministic
function of the row id* (hash-mixed), so the dataset is identical for any
partitioning, parallelism, or cluster size — the property the two-
parallelism scaling benchmark depends on.

Fixture semantics follow FIXTURES.md §1-3:
- pages: Common-Crawl-style rows (url, warc_ts, html, text, lang) with a
  configurable hot-key skew fraction;
- changes: LSN-ordered I/U/D events (~60/30/10) over the same url space,
  with adversarial same-key sequences and out-of-order warc_ts;
- evolution: events past ``evolve_from_lsn`` carry an added ``fetch_status``
  int column and a widened ``content_len`` (int → bigint payloads).

``html`` embeds the url and a payload marker; ``text`` is the reference
extractor's output (functions/extract.py) so the byte-identical-text-per-
url invariant can be asserted end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# deterministic 64-bit mix expressed in Spark SQL — xxhash64 over
# (value, salt), stable across sessions, partitionings, and cluster sizes.
def _mix(col, salt: int):
    return F.xxhash64(col.cast("long"), F.lit(salt).cast("long"))


def _pos(col):
    """Non-negative version of a hashed long."""
    return F.abs(col) % F.lit(2**62)


LANGS = ["en", "zh", "de", "fr", "es"]


def _url_expr(idx_col, n_sites: int, hot_fraction: float, n_hot: int):
    """url for a page index; a `hot_fraction` of *event* references hit one
    of `n_hot` hot urls (skew fixture, FIXTURES.md §1)."""
    return F.concat(
        F.lit("https://site"),
        (F.pmod(F.xxhash64(idx_col), F.lit(n_sites))).cast("string"),
        F.lit(".example/p/"),
        idx_col.cast("string"),
    )


def html_expr(url_col, payload_col, n_paragraphs: int = 0):
    """Deterministic template HTML bytes embedding url + payload.

    ``n_paragraphs`` appends that many filler paragraphs (~120 B each,
    content varied per url by hash) to reach Common-Crawl-ish page sizes
    (20 ≈ 2.8 KB) — page weight matters for honest throughput numbers.
    A slice of pages is latin-1 encoded (FIXTURES.md §1), exercising the
    extractor's decode determinism.
    """
    non_utf8 = F.pmod(F.xxhash64(url_col), F.lit(20)) == 0
    parts = [
        F.lit("<html><head><title>Page "),
        url_col,
        F.lit('</title><meta charset="'),
        F.when(non_utf8, F.lit("latin-1")).otherwise(F.lit("utf-8")),
        F.lit('"><style>.c{color:red}</style></head><body><h1>Doc&nbsp;'),
        payload_col,
        F.lit("</h1><p>content "),
        payload_col,
        F.lit(" of "),
        url_col,
        F.lit("</p>"),
    ]
    for i in range(n_paragraphs):
        h = F.pmod(F.xxhash64(url_col, F.lit(i)), F.lit(99991)).cast("string")
        parts += [
            F.lit(f'<p>paragraph {i} of the page body with filler words and <b>markup</b> plus a <a href="/l/'),
            h,
            F.lit('">link '),
            h,
            F.lit("</a> &amp; trailing text segment.</p>"),
        ]
    parts += [F.lit('<script>var x=1;</script><!-- c --></body></html>')]
    head = F.concat(*parts)
    body = F.when(
        non_utf8, F.encode(F.regexp_replace(head, "content", "contenté"), "ISO-8859-1")
    ).otherwise(F.encode(head, "UTF-8"))
    return body


def pages_df(
    spark: SparkSession,
    n: int,
    n_sites: int = 50,
    seed: int = 42,
    partitions: int | None = None,
    html_paragraphs: int = 0,
) -> DataFrame:
    """Base web-pages table: one row per url index 0..n-1."""
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    idx = F.col("id")
    url = _url_expr(idx, n_sites, 0.0, 0)
    payload = F.concat(F.lit("v0-"), _pos(_mix(idx, seed)).cast("string"))
    warc_ts = F.timestamp_seconds(F.lit(1704067200) + (idx % 86400))  # 2024-01-01 +
    html = html_expr(url, payload, html_paragraphs)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (F.pmod(F.xxhash64(url), F.lit(len(LANGS))) + 1).cast("int")
    )
    return base.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        lang.alias("lang"),
    )


def changes_df(
    spark: SparkSession,
    n_events: int,
    n_keys: int,
    n_sites: int = 50,
    seed: int = 42,
    hot_fraction: float = 0.1,
    n_hot: int = 5,
    start_lsn: int = 1,
    evolve_from_lsn: int | None = None,
    partitions: int | None = None,
    html_paragraphs: int = 0,
) -> DataFrame:
    """LSN-ordered change events over a key space of ``n_keys`` urls.

    Op mix ≈ 60% I / 30% U / 10% D by event hash; U/D target existing key
    indices; ``hot_fraction`` of U events collapse onto ``n_hot`` hot keys
    (skew). ``warc_ts`` mostly tracks lsn but ~5% of events get an
    out-of-order (older) timestamp to exercise the cross-batch LWW guard.
    """
    base = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    lsn = (i + F.lit(start_lsn)).alias("lsn")
    h_op = F.pmod(_pos(_mix(i, seed * 7 + 1)), F.lit(100))
    op = (
        F.when(h_op < 60, F.lit("I")).when(h_op < 90, F.lit("U")).otherwise(F.lit("D"))
    )
    # key index: I events introduce key (i mod n_keys); U/D hit a hashed
    # existing key; hot skew for a slice of U events
    h_key = F.pmod(_pos(_mix(i, seed * 13 + 2)), F.lit(n_keys))
    is_hot = (h_op >= 60) & (F.pmod(_pos(_mix(i, seed * 17 + 3)), F.lit(100)) < int(hot_fraction * 100))
    key_idx = (
        F.when(h_op < 60, F.pmod(i, F.lit(n_keys)))
        .when(is_hot, F.pmod(h_key, F.lit(n_hot)))
        .otherwise(h_key)
    )
    url = _url_expr(key_idx, n_sites, hot_fraction, n_hot)
    # event time: base + lsn seconds, but ~5% get pushed 2h into the past
    ooo = F.pmod(_pos(_mix(i, seed * 19 + 4)), F.lit(100)) < 5
    ts_sec = F.lit(1704067200) + i + F.when(ooo, F.lit(-7200)).otherwise(F.lit(0))
    warc_ts = F.timestamp_seconds(ts_sec)
    payload = F.concat(F.lit("v"), i.cast("string"), F.lit("-"), _pos(_mix(i, seed)).cast("string"))
    html = F.when(op == "D", F.lit(None).cast("binary")).otherwise(
        html_expr(url, payload, html_paragraphs)
    )
    lang = F.when(op == "D", F.lit(None).cast("string")).otherwise(
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            (F.pmod(F.xxhash64(url), F.lit(len(LANGS))) + 1).cast("int"),
        )
    )
    out = base.select(
        lsn,
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        lang.alias("lang"),
    )
    if evolve_from_lsn is not None:
        # schema evolution fixture (FIXTURES.md §3): late events add
        # fetch_status int and a content_len that outgrows int range.
        out = _evolved(out, evolve_from_lsn)
    return out


def _evolved(out: DataFrame, evolve_from_lsn: int) -> DataFrame:
    late = out.filter(F.col("lsn") >= evolve_from_lsn).select(
        "*",
        F.pmod(F.xxhash64("url"), F.lit(3)).cast("int").alias("fetch_status"),
        (F.length(F.coalesce(F.col("html").cast("string"), F.lit(""))).cast("bigint")
         + F.lit(2) * F.lit(2**31)).alias("content_len"),
    )
    early = out.filter(F.col("lsn") < evolve_from_lsn)
    return early.unionByName(late, allowMissingColumns=True)
