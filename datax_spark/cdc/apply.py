"""Batch apply: validate → quarantine → evolve schema → fenced MERGE.

This is the ``foreachBatch`` body of the streaming pipeline and the unit
the replay-convergence tests exercise directly. It composes:

1. **dirty-record quarantine** — rows failing validation (null key, bad
   op, null lsn) are routed to a dead-letter parquet dir with a reason,
   and record/percentage error limits abort the batch — the semantics of
   DataX's ``TaskPluginCollector.collectDirtyRecord`` +
   ``ErrorRecordChecker`` (``core/.../util/ErrorRecordChecker.java:18-81``).
2. **schema evolution** — the batch's observed schema is union-evolved
   into the table schema (add/widen per lake/schema.py) before merge.
3. **exactly-once fencing** — if ``batch_id <= table.last_batch_id``,
   the merge is skipped (idempotent replay after restart), the stream-load
   label pattern (``StarRocksStreamLoadVisitor.java:160-185``).
4. **LWW MERGE** via lake/merge.py.

Returns a metrics dict (the per-micro-batch lineage/metrics row).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable
from datax_spark.quarantine import ErrorLimits


def apply_changes(
    table: LakeTable,
    batch: DataFrame,
    batch_id: int | None = None,
    stream_id: str = "default",
    ts_col: str = "warc_ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    quarantine_dir: str | None = None,
    error_limits: ErrorLimits | None = None,
    evolve: bool = True,
    transform=None,
    fence_epoch: str | None = None,
    merge_mode: str = "cow",
    summary_extra: dict | None = None,
) -> dict:
    """Apply one change batch to the lake table. Idempotent per batch_id.

    ``transform`` (df → df, e.g. the html→text extractor) runs on the
    post-dedup LWW winners inside the merge — the Spark placement of the
    reference's reader-thread transformer chain
    (``BufferedRecordTransformerExchanger.java:85-92``), but paying per
    unique key instead of per record.

    Dirty rows ride as an ``observe()`` metric (no extra scan); error
    limits are checked after the batch commits — job-level abort, the
    reference's report-tick semantics (``ErrorRecordChecker`` invoked from
    ``AbstractScheduler.java:89``), not a per-batch rollback.
    """
    t0 = time.time()
    key = table.key_col

    if batch_id is not None and batch_id <= table.last_batch_id(stream_id, fence_epoch):
        return {
            "stream_id": stream_id,
            "batch_id": batch_id,
            "skipped": True,
            "reason": "batch_id already committed (fence)",
        }

    from datax_spark.quarantine import split_dirty_lazy, write_quarantine

    clean, obs, tagged = split_dirty_lazy(batch, key_col=key, op_col=op_col, lsn_col=lsn_col)

    new_schema = None
    changes_applied: list[str] = []
    if evolve:
        payload_schema = clean.drop(op_col, lsn_col).schema
        evolved, changes_applied = table.evolve_schema(payload_schema)
        if changes_applied:
            new_schema = evolved

    snap = merge_into(
        table,
        clean,
        ts_col=ts_col,
        lsn_col=lsn_col,
        op_col=op_col,
        stream_id=stream_id,
        batch_id=batch_id,
        new_schema=new_schema,
        post_dedup_transform=transform,
        summary_extra={"schema_changes": changes_applied, **(summary_extra or {})},
        fence_epoch=fence_epoch,
        merge_mode=merge_mode,
    )
    try:
        metrics = obs.get
        dirty_count = int(metrics.get("dirty", 0) or 0)
        total = int(metrics.get("total", 0) or 0)
    except Exception:
        # The CollectMetrics node can be optimized out of every executed
        # plan when the batch is a driver-side LocalRelation whose rows
        # are ALL statically dirty: constant folding evaluates the dirty
        # filter at plan time, PropagateEmptyRelation collapses the
        # subtree, and the observation never fires (file/stream batches
        # cannot fold, so the streaming path is unaffected). Fall back to
        # eager counts — this branch only triggers on tiny local batches
        # (e.g. quarantine replays), where two extra counts are free.
        dirty_count = int(tagged.filter(F.col("_dirty_reason").isNotNull()).count())
        total = int(batch.count())
    if dirty_count:
        if quarantine_dir:
            write_quarantine(tagged, quarantine_dir, batch_id)
        if error_limits is not None:
            error_limits.check(dirty_count, total)
    dt = time.time() - t0
    rows = int(snap["summary"].get("batch_rows", 0))
    return {
        "stream_id": stream_id,
        "batch_id": batch_id,
        "skipped": False,
        "snapshot_id": snap["snapshot_id"],
        "batch_rows": rows,
        "rows_in": total,  # raw admitted rows (= listener numInputRows)
        "dirty_rows": dirty_count,
        "schema_changes": changes_applied,
        "lineage": snap["summary"].get("lineage", {}),
        "seconds": dt,
        "events_per_sec": rows / dt if dt > 0 else None,
    }
