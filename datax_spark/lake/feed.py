"""Table-to-table incremental sync: compose lake tables into pipelines.

``read_incremental`` makes a table a CDC *source*; this module closes
the loop by applying its feed to another lake table through the same
quarantine → LWW → fenced MERGE path every other change stream takes.
A downstream table (a filtered copy, a different bucket layout, another
region) stays convergent with its upstream by calling ``sync_incremental``
per tick — the lake analog of chaining DataX jobs reader→writer, with
exactly-once provided by the snapshot watermark recorded in each sync
commit (crash between ticks → the next tick re-reads from the last
COMMITTED watermark; re-applied rows are LWW no-ops).

Cost per tick ∝ data written upstream since the watermark, never table
size; the first tick bootstraps from a full snapshot read.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.cdc.apply import apply_changes
from datax_spark.lake.table import LSN_COL, LakeTable

_WATERMARK = "sync_src_snapshot"


def last_synced_snapshot(dst: LakeTable) -> int | None:
    """The upstream snapshot id the newest sync commit covered."""
    for snap in reversed(dst.snapshots()):
        wm = snap["summary"].get(_WATERMARK)
        if wm is not None:
            return int(wm)
    return None


def sync_incremental(
    src: LakeTable,
    dst: LakeTable,
    transform=None,
    merge_mode: str = "cow",
    stream_id: str = "table_sync",
    assume_monotone_lsn: bool = True,
) -> dict:
    """One sync tick. Returns the apply metrics dict (plus
    ``src_snapshot`` / ``skipped``). Re-running after any crash is safe:
    the watermark only advances in the same atomic commit that applies
    the rows."""
    src_snap = src.current_snapshot()
    if src_snap is None:
        return {"skipped": True, "reason": "source has no snapshots"}
    src_sid = int(src_snap["snapshot_id"])
    base = last_synced_snapshot(dst)
    if base == src_sid:
        return {"skipped": True, "reason": "already at source snapshot",
                "src_snapshot": src_sid}

    key = src.key_col
    if base is None:
        # bootstrap: current state as inserts (system cols give lsn)
        feed = (src.read(include_system=True)
                .withColumn("_op", F.lit("I")))
    else:
        feed = src.read_incremental(base, src_sid, include_system=True,
                                    assume_monotone_lsn=assume_monotone_lsn)

    user_cols = [c for c in src.user_schema().fieldNames() if c != key]
    ch = feed.select(
        F.col(key),
        F.col("_op").alias("op"),
        F.col(LSN_COL).alias("lsn"),
        *[F.col(c) for c in user_cols],
    )
    # the sync stream's batch id is the upstream snapshot id — monotone,
    # so the fence also dedups overlapping ticks racing on the same feed
    ts_col = src._require_meta()["properties"].get("lww_ts_col", "warc_ts")
    m = apply_changes(
        dst, ch, batch_id=src_sid, stream_id=stream_id, ts_col=ts_col,
        transform=transform, merge_mode=merge_mode,
        summary_extra={_WATERMARK: src_sid},
    )
    m["src_snapshot"] = src_sid
    return m
