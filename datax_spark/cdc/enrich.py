"""Stream-stream enrichment join for the change pipeline.

A CDC stream often needs context from a SECOND stream rather than a
static dim table — e.g. per-host crawl policies, account-tier changes,
rate-limit configs — where "the metadata row in force WHEN the change
happened" matters. That is Structured Streaming's watermarked
stream-stream join: both sides buffered in state, joined under an
event-time range condition, state expired by the watermarks.

DataX's model has nothing to say here (each reader is an independent
channel; no cross-stream operator exists) — engine-added surface, built
entirely on Spark's join-state machinery rather than custom state.

Semantics: change row c matches metadata rows m of the same key with
``m.ts ∈ (c.ts - tolerance, c.ts]`` — "metadata published at or before
the change, no older than the tolerance". Inner mode drops changes with
no in-window metadata; left mode keeps them with NULL metadata (left
outer stream-stream joins require BOTH watermarks + the time range —
enforced here). If several metadata versions fall inside the window the
join yields one row per version; keep the windows tight or collapse
downstream (``scd2_snapshot``-style LWW) — a deliberate non-choice, the
downstream owns the pick.

State sizing at 100 TB rates: each side buffers rows only until the
other side's watermark passes ``tolerance``; state ∝ rate × (tolerance +
watermark delay), independent of stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["stream_enrich_join"]


def stream_enrich_join(
    changes: DataFrame,
    meta: DataFrame,
    key_col: str,
    meta_key_col: str | None = None,
    ch_ts: str = "warc_ts",
    meta_ts: str = "meta_ts",
    tolerance: str = "2 hours",
    changes_watermark: str = "1 hour",
    meta_watermark: str = "1 hour",
    how: str = "inner",
    meta_prefix: str = "m_",
) -> DataFrame:
    """Join a change stream with a metadata stream on key + event-time
    range (see module docstring). Works identically on batch DataFrames
    (watermarks are no-ops there), so the same plan is testable offline.

    Metadata columns (except its key) are prefixed with ``meta_prefix``
    to avoid collisions; the metadata timestamp keeps its (prefixed)
    name so downstream LWW collapse can order on it.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    mk = meta_key_col or key_col

    c = changes
    m = meta.select(
        F.col(mk).alias("_mk"),
        *[
            F.col(n).alias(f"{meta_prefix}{n}")
            for n in meta.columns
            if n != mk
        ],
    )
    if changes.isStreaming:
        c = c.withWatermark(ch_ts, changes_watermark)
    if meta.isStreaming:
        m = m.withWatermark(f"{meta_prefix}{meta_ts}", meta_watermark)

    mts = F.col(f"{meta_prefix}{meta_ts}")
    cond = (
        (c[key_col] == m["_mk"])
        & (mts <= c[ch_ts])
        & (mts > c[ch_ts] - F.expr(f"INTERVAL {tolerance}"))
    )
    joined = c.join(m, cond, "inner" if how == "inner" else "leftOuter")
    return joined.drop("_mk")
