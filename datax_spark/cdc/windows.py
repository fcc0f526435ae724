"""Event-time windowed aggregation over the change stream, with
watermarked late-data handling.

DataX has no event-time semantics (its only time concepts are the
bounded replay window of otsstreamreader, ``README.md:140-146``, and
wall-clock rate limiting). For an ingest engine, per-window change-rate
rollups are the standard operational surface (events/min per op type,
per shard LSN progress) — here they're Structured Streaming windowed
aggregations with a watermark bounding state for late events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_change_counts(
    changes: DataFrame,
    ts_col: str = "warc_ts",
    window_duration: str = "1 hour",
    watermark: str | None = None,
    group_cols: tuple[str, ...] = ("op",),
) -> DataFrame:
    """Tumbling-window change counts (streaming or batch DataFrame).

    On a stream, ``watermark`` (e.g. ``"2 hours"``) bounds how long the
    window state waits for late events before finalizing — the engine's
    late-data policy for monitoring rollups (the MERGE path itself never
    drops late events; the LWW guard makes them converge instead).
    """
    df = changes
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )
