"""Key-partitioned MERGE INTO for LakeTable (copy-on-write, bucket-pruned).

Semantics follow the reference's change-op algebra — upsert + row delete
(``otsstreamreader/.../core/MultiVerModeRecordSender.java:23-28`` opTypes,
``SingleVerAndUpOnlyModeRecordSender.java:40-53`` PUT/UPDATE→upsert,
DELETE→row delete) combined with the upsert templates DataX delegates to
sinks (``plugin-rdbms-util/.../writer/util/WriterUtil.java:111-168``
REPLACE / ON DUPLICATE KEY UPDATE). Expressed as SQL it is::

    MERGE INTO t USING c ON t.key = c.key
    WHEN MATCHED AND c.op = 'D' AND c_newer           THEN DELETE   (tombstone)
    WHEN MATCHED AND c.op IN ('I','U') AND c_newer    THEN UPDATE *
    WHEN NOT MATCHED AND c.op <> 'D'                  THEN INSERT *

where ``c_newer`` is the cross-batch last-writer-wins guard
``(c.warc_ts, c.lsn) > (t.warc_ts, t._lsn)`` — stale replays are no-ops,
which is what makes batch retries + out-of-order arrival convergent
(SURVEY §7.4 risks 1-2).

Scale design:
- changes are LWW-deduped to one row per key with a *hash aggregate*
  (``max_by``-style struct max), not a window sort — partial map-side
  combine absorbs hot-key skew before any shuffle (salting is implicit in
  partial aggregation; AQE skew-join covers the join stage).
- only buckets containing changed keys are read and rewritten
  (manifest-driven copy-on-write); merge cost ∝ batch, not table.
- the deduped batch is broadcast to the target scan when small (the common
  CDC case), so the wide target rows never shuffle; the insert anti-join
  shuffles a key-only projection. Set ``broadcast_threshold_rows=0`` to
  force the shuffle path (for huge backfill batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datax_spark.lake.table import (
    DELETED_COL,
    LSN_COL,
    LakeTable,
    bucket_expr,
)

OP_COL = "op"
# Broadcast builds the whole deduped batch into a driver-side hash
# relation — single-threaded and O(batch bytes). Worth it only for
# trickle batches; web-page rows are KBs, so cap by rows such that the
# build stays ~100s of MB. Large backfill batches take the shuffle path.
DEFAULT_BROADCAST_ROWS = 100_000
# Key-ONLY broadcast (semi/anti target split) stays viable far beyond
# the full-row threshold: 5M keys × ~40 B ≈ 200 MB hash relation.
DEFAULT_KEY_BROADCAST_ROWS = 5_000_000


def lww_dedup(changes: DataFrame, key_col: str, ts_col: str, lsn_col: str) -> DataFrame:
    """Last-writer-wins: keep the single newest event per key by
    ``(ts, lsn)``.

    Implemented as an aggregate of ``max(struct(ts, lsn, payload...))``
    rather than ``row_number() OVER`` — the hash aggregate gets map-side
    partial combine (each task reduces its own slice of a hot key first),
    so a key with 10M updates in one batch costs ~one row per task in the
    shuffle instead of 10M rows into one window partition. ``lsn`` is a
    unique total order, so ties cannot reach the payload fields.
    """
    payload = [c for c in changes.columns if c not in (key_col,)]
    ordered = [ts_col, lsn_col] + [c for c in payload if c not in (ts_col, lsn_col)]
    packed = changes.groupBy(key_col).agg(
        F.max(F.struct(*[F.col(c) for c in ordered])).alias("_w")
    )
    return packed.select(key_col, *[F.col(f"_w.{c}").alias(c) for c in ordered])


def bulk_load(
    table: LakeTable,
    df: DataFrame,
    lsn: int = 0,
    operation: str = "append",
) -> dict:
    """Initial/bulk append of unique-keyed rows (no merge join).

    The DataX analogue is a plain ``insert`` writeMode load
    (``WriterUtil.java:111-146``); keys must not collide with existing
    live rows — use ``merge_into`` otherwise.
    """
    tschema = table.schema()
    out = df
    if LSN_COL not in out.columns:
        out = out.withColumn(LSN_COL, F.lit(lsn).cast("bigint"))
    if DELETED_COL not in out.columns:
        out = out.withColumn(DELETED_COL, F.lit(False))
    out = out.select(*[F.col(f.name).cast(f.type).alias(f.name) for f in tschema.fields])
    entries = table.write_data_files(out, tschema)
    return table.commit(entries, set(), operation=operation)


def merge_into(
    table: LakeTable,
    changes: DataFrame,
    ts_col: str = "warc_ts",
    lsn_col: str = "lsn",
    op_col: str = OP_COL,
    stream_id: str | None = None,
    batch_id: int | None = None,
    broadcast_threshold_rows: int = DEFAULT_BROADCAST_ROWS,
    key_broadcast_threshold_rows: int = DEFAULT_KEY_BROADCAST_ROWS,
    dedup: bool = True,
    summary_extra: dict | None = None,
    new_schema=None,
    post_dedup_transform=None,
    fence_epoch: str | None = None,
    merge_mode: str = "cow",
) -> dict:
    """Apply a batch of change events to ``table``; returns the snapshot.

    ``changes`` columns: key, op ('I'|'U'|'D'), ts_col, lsn_col, payload...
    Schema evolution (``new_schema``) is resolved by the caller
    (cdc.apply) so quarantine can intercept incompatible rows first.

    ``post_dedup_transform`` (df → df) runs on the LWW winners only — the
    placement for expensive per-row work like html→text extraction: cost
    scales with unique keys per batch, not raw events (a hot key updated
    10^6 times in a batch is extracted once). CONTRACT: the transform is
    an enrichment — it must preserve rows 1:1 and must not modify the
    key/ts/lsn columns (the CoW path derives touched buckets and lineage
    from a pre-transform column-pruned projection; a key-rewriting
    transform would desynchronize them). Enforced structurally below.

    ``merge_mode``:
    - ``cow`` (copy-on-write): touched buckets are read, merged, and
      rewritten — reads stay collapse-free, writes cost ∝ bucket size.
      Right for backfills and low-frequency large batches.
    - ``mor`` (merge-on-read): the deduped batch is appended as DELTA
      files only — no target read, no bucket rewrite; ``table.read()``
      collapses versions by (ts, lsn) and ``compact_buckets`` folds
      deltas back into base files. Right for trickle batches, where CoW
      would rewrite whole buckets for a handful of keys. Both modes
      produce byte-identical table state (same LWW ordering).
    """
    key = table.key_col
    nb = table.num_buckets

    c = lww_dedup(changes, key, ts_col, lsn_col) if dedup else changes
    if post_dedup_transform is not None:
        before = set(c.columns)
        c = post_dedup_transform(c)
        dropped = before - set(c.columns)
        if dropped:
            raise ValueError(
                "post_dedup_transform must be a 1:1 enrichment that keeps "
                f"all input columns; it dropped {sorted(dropped)}"
            )

    tschema = new_schema if new_schema is not None else table.schema()
    user_cols = [f.name for f in tschema.fields if f.name not in (LSN_COL, DELETED_COL)]

    # align the change payload to the (possibly evolved) table user schema
    tmap = {f.name: f for f in tschema.fields}
    aligned_cols = []
    for name in user_cols:
        if name in c.columns:
            aligned_cols.append(F.col(name).cast(tmap[name].type).alias(name))
        else:
            aligned_cols.append(F.lit(None).cast(tmap[name].type).alias(name))

    def _aligned(df):
        return df.select(
            F.col(op_col).alias("_cop"),
            F.col(ts_col).cast("timestamp").alias("_cts"),
            F.col(lsn_col).cast("bigint").alias("_clsn"),
            *aligned_cols,
        )

    if merge_mode == "mor":
        # Append-only delta write: ONE Spark job — dedup/enrichment flow
        # straight into the bucket-partitioned write, with no target
        # scan, no bucket rewrite, no persist, and no separate stats job
        # (per-bucket lineage = the _lsn min/max + row counts the writer
        # already reads from the parquet footers). Stale/duplicate
        # versions simply lose at read-time collapse — no guard needed.
        delta = _aligned(c).select(
            *[
                (
                    F.col("_clsn").alias(LSN_COL)
                    if f.name == LSN_COL
                    else (F.col("_cop") == F.lit("D")).alias(DELETED_COL)
                    if f.name == DELETED_COL
                    else F.col(f.name)
                )
                for f in tschema.fields
            ]
        )
        entries = table.write_data_files(delta, tschema, kind="delta")
        batch_rows = sum(e["records"] for e in entries)
        lineage: dict[int, dict] = {}
        for e in entries:
            b = lineage.setdefault(e["bucket"], {"rows": 0, "lsn_min": None, "lsn_max": None})
            b["rows"] += e["records"]
            if e.get("lsn_min") is not None:
                b["lsn_min"] = e["lsn_min"] if b["lsn_min"] is None else min(b["lsn_min"], e["lsn_min"])
                b["lsn_max"] = e["lsn_max"] if b["lsn_max"] is None else max(b["lsn_max"], e["lsn_max"])
        extra = {"lineage": lineage, "batch_rows": batch_rows, "merge_strategy": "mor-delta"}
        extra.update(summary_extra or {})
        return table.commit(
            entries,
            replaced_buckets=set(),
            operation="merge",
            stream_id=stream_id,
            batch_id=batch_id,
            summary_extra=extra,
            new_schema=new_schema,
            fence_epoch=fence_epoch,
            # pin the read-time collapse ordering column on first use
            properties_update={"lww_ts_col": ts_col},
        )
    if merge_mode != "cow":
        raise ValueError(f"unknown merge_mode {merge_mode!r} (cow|mor)")

    # ---- copy-on-write path: bucket pruning requires the touched-bucket
    # set BEFORE the target scan, so one stats job precedes the write.
    # The stats job runs over a COLUMN-PRUNED (key, ts, lsn) projection
    # of the raw changes — dedup of three narrow columns — instead of
    # persisting the full enriched batch: the parquet scan reads only
    # those columns (pushdown-verified), the stats shuffle carries ~24 B
    # rows, and the multi-KB payload + Arrow enrichment run exactly once
    # inside the write job (no multi-GB cache materialization between
    # jobs — measured round 1's persist cost DRAM bandwidth that didn't
    # scale across cores).
    narrow = changes.select(
        F.col(key), F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(lsn_col).cast("bigint").alias("_l"),
    )
    if dedup:
        narrow = (
            narrow.groupBy(key)
            .agg(F.max(F.struct("_ts", "_l")).alias("_w"))
            .select(key, F.col("_w._l").alias("_l"))
        )
    stats_rows = (
        narrow.withColumn("_cbucket", bucket_expr(key, nb))
        .groupBy("_cbucket")
        .agg(F.count("*").alias("n"), F.min("_l").alias("lmin"), F.max("_l").alias("lmax"))
        .collect()
    )
    touched = {int(r["_cbucket"]) for r in stats_rows}
    batch_rows = sum(int(r["n"]) for r in stats_rows)
    lineage = {
        int(r["_cbucket"]): {"rows": int(r["n"]), "lsn_min": int(r["lmin"]), "lsn_max": int(r["lmax"])}
        for r in stats_rows
    }

    if batch_rows == 0:
        return table.commit([], set(), operation="merge", stream_id=stream_id,
                            batch_id=batch_id, summary_extra=summary_extra,
                            new_schema=new_schema, fence_epoch=fence_epoch)

    # The enriched batch feeds two consumers in the write job (survivors
    # join + insert anti-join); persist so dedup + Arrow enrichment run
    # once. Batches are trigger-bounded; DISK spill keeps this safe.
    from pyspark import StorageLevel

    c_aligned = _aligned(c).persist(StorageLevel.MEMORY_AND_DISK)

    use_broadcast = 0 < batch_rows <= broadcast_threshold_rows
    # big batches can't broadcast FULL rows, but the change KEY SET is
    # ~tens of bytes/key — broadcastable far beyond the row threshold.
    # A key-only broadcast semi/anti split keeps the UNMATCHED target
    # rows (the bulk of touched-bucket bytes) out of the merge-join
    # shuffle entirely: only matched target rows (∝ batch keys) shuffle.
    # Shuffle bytes are the resource that doesn't scale with cores on a
    # single box — and the per-node resource a real cluster must conserve.
    use_key_split = (not use_broadcast) and batch_rows <= key_broadcast_threshold_rows
    c_side = F.broadcast(c_aligned) if use_broadcast else c_aligned

    target = table.read(buckets=sorted(touched), include_deleted=True, include_system=True)
    # target rows aligned to evolved schema too
    t_aligned_cols = []
    for f in tschema.fields:
        if f.name in target.columns:
            t_aligned_cols.append(F.col(f.name).cast(f.type).alias(f.name))
        else:
            t_aligned_cols.append(F.lit(None).cast(f.type).alias(f.name))
    target = target.select(*t_aligned_cols)

    t_pref = target.select(*[F.col(cn).alias(f"_t_{cn}") for cn in target.columns])
    untouched = None
    if use_key_split:
        c_keys = c_aligned.select(F.col(key).alias("_k"))
        t_matched = t_pref.join(
            F.broadcast(c_keys), t_pref[f"_t_{key}"] == F.col("_k"), "left_semi"
        )
        untouched = t_pref.join(
            F.broadcast(c_keys), t_pref[f"_t_{key}"] == F.col("_k"), "left_anti"
        ).select(*[F.col(f"_t_{f.name}").alias(f.name) for f in tschema.fields])
        joined = t_matched.join(c_side, t_matched[f"_t_{key}"] == c_side[key], "left")
    else:
        joined = t_pref.join(c_side, t_pref[f"_t_{key}"] == c_side[key], "left")

    # LWW ordering identical to the MoR read-time collapse (struct max
    # with null ts lowest): a null-ts change loses to any real target ts;
    # a null-ts target loses to any real change ts; both null → lsn.
    c_newer = F.col(key).isNotNull() & (
        (F.col("_cts") > F.col(f"_t_{ts_col}"))
        | ((F.col("_cts") == F.col(f"_t_{ts_col}")) & (F.col("_clsn") > F.col(f"_t_{LSN_COL}")))
        | (
            F.col(f"_t_{ts_col}").isNull()
            & (F.col("_cts").isNotNull() | (F.col("_clsn") > F.col(f"_t_{LSN_COL}")))
        )
    )

    def pick(name: str):
        if name == LSN_COL:
            win = F.col("_clsn")
            lose = F.col(f"_t_{LSN_COL}")
        elif name == DELETED_COL:
            win = F.col("_cop") == F.lit("D")
            lose = F.col(f"_t_{DELETED_COL}")
        elif name == key:
            return F.col(f"_t_{key}").alias(key)
        elif name == ts_col:
            win, lose = F.col("_cts"), F.col(f"_t_{ts_col}")
        else:
            win, lose = F.col(name), F.col(f"_t_{name}")
        return F.when(c_newer, win).otherwise(lose).alias(name)

    survivors = joined.select(*[pick(f.name) for f in tschema.fields])
    if untouched is not None:
        survivors = survivors.unionByName(untouched)

    # inserts: change keys absent from the touched-bucket target scan.
    # anti-join shuffles only the key column of the target — narrow.
    t_keys = target.select(key)
    inserts = (
        c_aligned.join(t_keys, on=key, how="left_anti")
        .select(
            *[
                (
                    F.col("_clsn").alias(LSN_COL)
                    if f.name == LSN_COL
                    else (F.col("_cop") == F.lit("D")).alias(DELETED_COL)
                    if f.name == DELETED_COL
                    else F.col(f.name)
                )
                for f in tschema.fields
            ]
        )
        # a D for a key we've never seen still writes a tombstone so that
        # an out-of-order older I/U arriving later stays dead
    )

    final = survivors.unionByName(inserts)

    entries = table.write_data_files(final, tschema)
    c_aligned.unpersist()
    extra = {"lineage": lineage, "batch_rows": batch_rows,
             "merge_strategy": "broadcast" if use_broadcast else "shuffle"}
    extra.update(summary_extra or {})
    return table.commit(
        entries,
        replaced_buckets=touched,
        operation="merge",
        stream_id=stream_id,
        batch_id=batch_id,
        summary_extra=extra,
        new_schema=new_schema,
        fence_epoch=fence_epoch,
    )
