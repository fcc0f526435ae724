"""Bucket-aware reads: kill the exchange on the read side.

The table's files are already hash-clustered by ``pmod(xxhash64(key),
num_buckets)`` (lake/table.py::bucket_expr), so any computation whose
grouping key is the table key (or a function of it) is ALREADY
co-located on disk — yet an ad-hoc ``table.read().groupBy(key)`` pays a
full ``Exchange hashpartitioning(key)`` because a plain parquet scan
declares no output partitioning, and the Python DataSource API (Spark
4.1) has no way to declare one either (the JVM-side DSv2
``SupportsReportPartitioning`` contract is not exposed to Python).

This module closes the gap from the query side:

- ``read_bucketed``: one DataFrame per bucket — each a plain pruned
  scan of that bucket's files (manifest-driven file skipping; other
  buckets are never opened).
- ``bucket_local_agg``: per-key aggregation executed INSIDE each bucket
  via ``coalesce(1)`` + ``mapInPandas`` (Arrow-batched, streaming
  partial aggregation over batches — constant memory in rows-per-key),
  then a union of the tiny per-bucket results. With ``collapse=False``
  (or a table carrying no MoR deltas) the physical plan is Scan →
  Coalesce → MapInPandas per branch: NO Exchange anywhere (pinned by
  tests/test_plans.py). With ``collapse=True`` on a table that DOES
  carry deltas, ``table.read`` inserts its read-time LWW collapse — an
  ``Exchange hashpartitioning(key)`` per branch — so the exchange-free
  claim does NOT hold there: compact first (``compact_buckets``), use
  ``collapse=False`` version analytics, or fall back to the single
  exchange of ``table.read().groupBy(key)``.

Scale notes (the honest trade-off, stated rather than hidden):

- The union has one branch per bucket, so the PLAN is O(buckets). That
  is the right shape for the common "aggregate a bucket subset" case
  and for moderate bucket counts; at 64 Ki buckets on a real cluster,
  dispatch per-bucket branches in chunks (``buckets=`` selects a
  subset) or fall back to ``table.read().groupBy(key)`` — one exchange,
  but a single-branch plan. Both are exposed; pick per workload.
- ``coalesce(1)`` makes one task per bucket — exactly the parallelism
  the bucket layout promises (a bucket ≈ 1–4 GB by sizing discipline).
- Supported aggregate functions are the decomposable ones (count /
  sum / min / max); integer sums are exact, float sums carry the usual
  accumulation-order caveat (pandas sums within one bucket's batches —
  deterministic for a fixed file layout).

DataX has no storage layer at all (readers stream to writers); this is
engine-added surface motivated by its champion limitation: every DataX
job re-reads the full source. A bucket layout that aggregation can
exploit without reshuffling is what makes repeated 100 TB analytics on
the ingested table affordable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from datax_spark.lake.table import LakeTable

_AGG_FNS = ("count", "sum", "min", "max")


def read_bucketed(
    table: LakeTable,
    buckets: list[int] | None = None,
    include_deleted: bool = False,
    include_system: bool = False,
    collapse: bool = True,
) -> list[tuple[int, DataFrame]]:
    """One (bucket_id, DataFrame) per non-empty bucket, manifest-pruned.

    ``collapse=False`` exposes raw version rows (every MoR delta write),
    which is what version-level analytics want; ``collapse=True`` gives
    the live LWW row per key, with the collapse running bucket-locally.

    Every per-bucket scan is PINNED to the snapshot enumerated here —
    without that, a concurrent ``load()``/commit on the same LakeTable
    instance mid-loop would mix table versions across branches.
    """
    snap = table.current_snapshot()
    present = sorted({e["bucket"] for e in table.manifest(snap)}) if snap else []
    if buckets is not None:
        want = set(buckets)
        present = [b for b in present if b in want]
    snap_id = snap["snapshot_id"] if snap else None
    return [
        (
            b,
            table.read(
                buckets=[b],
                include_deleted=include_deleted,
                include_system=include_system,
                collapse=collapse,
                snapshot_id=snap_id,
            ),
        )
        for b in present
    ]


def _out_field(df_schema: T.StructType, fn: str, col: str | None) -> T.DataType:
    if fn == "count":
        return T.LongType()
    src = df_schema[col].dataType
    if fn == "sum":
        if isinstance(src, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return T.LongType()
        if isinstance(src, T.DecimalType):
            return T.DecimalType(38, src.scale)
        return T.DoubleType()
    return src  # min / max keep the column type


def bucket_local_agg(
    table: LakeTable,
    aggs: dict[str, tuple[str, str | None]],
    buckets: list[int] | None = None,
    include_deleted: bool = False,
    include_system: bool = False,
    collapse: bool = True,
) -> DataFrame:
    """Exchange-free per-key aggregation over the bucketed layout.

    ``aggs``: output column → (fn, source column), fn ∈ count/sum/min/
    max (source None only for count). Grouping key is the table key.
    Returns the union of per-bucket aggregates; correctness rests on the
    bucket invariant (a key lives in exactly one bucket), which holds
    by construction of the write path.
    """
    for out, (fn, col) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"{out}: unsupported agg fn {fn!r} (use {_AGG_FNS})")
        if fn != "count" and col is None:
            raise ValueError(f"{out}: {fn} needs a source column")
        if fn == "count" and col is not None:
            # pandas g.size() is count(*); silently treating ('count',
            # col) as count(*) would diverge from SQL count(col)
            # (non-null) semantics — reject rather than mislead
            raise ValueError(
                f"{out}: count is count(*) here — pass (count, None); "
                "non-null column counts are not supported")
    key = table.key_col
    parts = read_bucketed(
        table, buckets=buckets, include_deleted=include_deleted,
        include_system=include_system, collapse=collapse,
    )
    if not parts:
        full = table.schema().spark_schema()
        fields = [T.StructField(key, full[key].dataType, True)] + [
            T.StructField(out, _out_field(full, fn, col), True)
            for out, (fn, col) in aggs.items()
        ]
        return table.spark.createDataFrame([], T.StructType(fields))

    sample = parts[0][1]
    out_schema = T.StructType(
        [T.StructField(key, sample.schema[key].dataType, True)]
        + [T.StructField(out, _out_field(sample.schema, fn, col), True) for out, (fn, col) in aggs.items()]
    )
    spec = {out: (fn, col) for out, (fn, col) in aggs.items()}

    def agg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # SQL null semantics, which pandas defaults diverge from:
        # sum/min/max of an all-null group must be NULL, not 0/NaN —
        # min_count=1 makes pandas yield NaN there, and the final
        # object-cast turns NaN into None so Arrow can emit NULL into
        # integer-typed output columns instead of crashing.
        partials: list[pd.DataFrame] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            g = pdf.groupby(key, sort=False)
            cols = {}
            for out, (fn, col) in spec.items():
                if fn == "count":
                    cols[out] = g.size()
                elif fn == "sum":
                    cols[out] = g[col].sum(min_count=1)
                else:
                    cols[out] = getattr(g[col], fn)()
            partials.append(pd.DataFrame(cols))
        if not partials:
            return  # empty bucket scan: yield no frames
        merged = pd.concat(partials)
        g = merged.groupby(level=0, sort=False)
        refold = {}
        for out, (fn, _) in spec.items():
            # partial-count refolds by SUM; sum/min/max refold by themselves
            if fn == "count":
                refold[out] = g[out].sum()
            elif fn == "sum":
                refold[out] = g[out].sum(min_count=1)
            else:
                refold[out] = getattr(g[out], fn)()
        res = pd.DataFrame(refold).reset_index().rename(columns={"index": key})
        res = res.astype(object).where(pd.notnull(res), None)
        yield res

    outs = [
        df_b.coalesce(1).mapInPandas(agg_partition, schema=out_schema)
        for _, df_b in parts
    ]
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def bucket_local_join(
    left: LakeTable,
    right: LakeTable,
    right_suffix: str = "_r",
    how: str = "inner",
    buckets: list[int] | None = None,
    collapse: bool = True,
) -> DataFrame:
    """Exchange-free equi-join of two CO-BUCKETED lake tables.

    Both tables hash their key with the same ``pmod(xxhash64(key),
    num_buckets)`` layout, so equal keys live in the same bucket id by
    construction whenever (a) ``num_buckets`` match and (b) the key
    column types match (xxhash64 of a long and of its string form
    differ) — both are validated here. Each bucket pair then joins
    LOCALLY: Scan(left bucket) ∪ Scan(right bucket) → Coalesce(1) →
    MapInPandas(in-memory hash join) — no Exchange in any branch (the
    plan the task-level "co-located joins via bucketing" story needs;
    pinned in tests/test_plans.py). A plain ``l.join(r, key)`` costs a
    full shuffle of BOTH tables because plain parquet scans declare no
    output partitioning and the Python DataSource API cannot declare
    one.

    Memory bound: one bucket of each side materializes in pandas inside
    a single task (the bucket sizing discipline — 1-4 GB buckets — is
    the contract that makes this safe; pandas overhead ~2-3× on top).
    ``how``: inner or left. Output columns: key, left payload columns,
    right payload columns (collision-renamed with ``right_suffix``).
    Same collapse caveat as ``bucket_local_agg``: ``collapse=True`` on a
    side that carries MoR deltas inserts that side's LWW-collapse
    exchange — compact first for the pure exchange-free shape.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if left.num_buckets != right.num_buckets:
        raise ValueError(
            f"co-located join needs equal bucket counts: "
            f"{left.num_buckets} != {right.num_buckets} (rebucket one side)")
    lkey, rkey = left.key_col, right.key_col
    ltype = left.schema().spark_schema()[lkey].dataType
    rtype = right.schema().spark_schema()[rkey].dataType
    if ltype != rtype:
        raise ValueError(
            f"key types must match for bucket co-location: {ltype} != {rtype}")

    lparts = dict(read_bucketed(left, buckets=buckets, collapse=collapse))
    rparts = dict(read_bucketed(right, buckets=buckets, collapse=collapse))
    want = sorted(set(lparts) | set(rparts)) if how == "left" else \
        sorted(set(lparts) & set(rparts))
    want = [b for b in want if b in lparts]  # left side drives row existence

    lcols = [f.name for f in left.user_schema().fields if f.name != lkey]
    rcols_raw = [f.name for f in right.user_schema().fields if f.name != rkey]
    rename = {c: (c + right_suffix if c in lcols else c) for c in rcols_raw}
    rcols = [rename[c] for c in rcols_raw]

    out_schema = T.StructType(
        [T.StructField(lkey, ltype, True)]
        + [T.StructField(c, left.user_schema()[c].dataType, True) for c in lcols]
        + [T.StructField(rename[c], right.user_schema()[c].dataType, True)
           for c in rcols_raw]
    )
    flat = [f.name for f in out_schema.fields]

    def join_bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ls, rs = [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ls.append(pdf[pdf["_side"] == 0])
            rs.append(pdf[pdf["_side"] == 1])
        l = pd.concat(ls) if ls else pd.DataFrame(columns=["_k", *lcols])
        r = pd.concat(rs) if rs else pd.DataFrame(columns=["_k", *rcols])
        merged = l[["_k", *lcols]].merge(
            r[["_k", *rcols]], on="_k", how=how, sort=False)
        merged = merged.rename(columns={"_k": lkey})[flat]
        # left-join misses give NaN — emit NULL (object cast) so Arrow
        # accepts them into integer/timestamp output fields
        yield merged.astype(object).where(pd.notnull(merged), None)

    empty = left.spark.createDataFrame([], out_schema)
    outs = []
    for b in want:
        lb = lparts[b].select(
            F.col(lkey).alias("_k"), F.lit(0).alias("_side"),
            *[F.col(c) for c in lcols],
            *[F.lit(None).cast(right.user_schema()[c].dataType).alias(rename[c])
              for c in rcols_raw],
        )
        if b in rparts:
            rb = rparts[b].select(
                F.col(rkey).alias("_k"), F.lit(1).alias("_side"),
                *[F.lit(None).cast(left.user_schema()[c].dataType).alias(c)
                  for c in lcols],
                *[F.col(c).alias(rename[c]) for c in rcols_raw],
            )
            u = lb.unionByName(rb)
        else:
            u = lb
        outs.append(u.coalesce(1).mapInPandas(join_bucket, schema=out_schema))
    if not outs:
        return empty
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
