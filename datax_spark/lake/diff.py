"""Anti-entropy table diff — merkle-style divergence detection between
two lake tables (e.g. a table and its ``feed.sync_incremental`` mirror).

At 100 TB you cannot verify replication by comparing rows: the win is a
signature pass whose exchange carries a few thousand rows, followed by
row-level work confined to the slivers that actually diverge (the
Merkle-tree / DynamoDB-anti-entropy pattern, expressed as two Spark
aggregations):

1. **Signatures**: every live row folds into its VIRTUAL bucket —
   ``pmod(xxhash64(key), n_virtual)`` — deliberately independent of
   either table's physical bucket layout, so tables with different
   ``num_buckets`` (or a rebucket in flight) compare fine. Per virtual
   bucket: ``bit_xor(xxhash64(key, canonical row repr))`` + row count.
   bit_xor is the order-free multiset fold (ANSI-safe — summing hashes
   overflows), and xxhash64 over the key AND value cols makes the
   signature sensitive to any column drift.
2. **Row diff**: only keys hashing into diverged virtual buckets are
   re-read (both sides filter ``pmod(...) isin diverged`` — a pushdown-
   friendly scan predicate), then exceptAll both ways names the rows.

``repair`` converges the target to the source (purge diverged keys,
re-insert source rows through the fenced merge) — the repair loop for a
mirror that missed ticks or suffered corruption.

Caveat, inherent to XOR folds: a diverged bucket goes undetected only
if the multiset symmetric difference of its row hashes XORs to exactly
zero — ~2^-64 per bucket for real divergence, and the row-count
comparison additionally catches equal-XOR cardinality drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datax_spark.lake.table import LakeTable

__all__ = ["bucket_signatures", "table_diff", "repair"]


def _canon(df: DataFrame, key_col: str, n_virtual: int):
    """(vbucket, row_hash) projection: hash over key + every value col
    in sorted-name order (deterministic across column-order drift)."""
    val_cols = sorted(c for c in df.columns if c != key_col)
    h = F.xxhash64(F.col(key_col), *[F.col(c) for c in val_cols])
    vb = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_virtual)).cast("int")
    return df.select(vb.alias("_vb"), h.alias("_rh"))


def bucket_signatures(
    table_or_df, key_col: str | None = None, n_virtual: int = 4096
) -> DataFrame:
    """(_vb, sig, n) — per-virtual-bucket multiset signature of the live
    rows. Accepts a LakeTable (reads live state) or any DataFrame."""
    if isinstance(table_or_df, LakeTable):
        df = table_or_df.read()
        key_col = key_col or table_or_df.key_col
    else:
        df = table_or_df
        if key_col is None:
            raise ValueError("key_col required for a plain DataFrame")
    return (
        _canon(df, key_col, n_virtual)
        .groupBy("_vb")
        .agg(F.bit_xor("_rh").alias("sig"), F.count("*").alias("n"))
    )


def table_diff(
    a, b, key_col: str | None = None, n_virtual: int = 4096
) -> dict:
    """Compare two tables/DataFrames. Returns::

        {"diverged_vbuckets": [...],      # virtual buckets that differ
         "only_in_a": DataFrame,          # rows a has, b lacks (or differ)
         "only_in_b": DataFrame}

    Signature pass first; the row-level exceptAll runs ONLY over rows of
    diverged virtual buckets on both sides. Identical tables cost two
    signature aggregations and zero row comparisons."""
    ta = a.read() if isinstance(a, LakeTable) else a
    tb = b.read() if isinstance(b, LakeTable) else b
    ka = key_col or (a.key_col if isinstance(a, LakeTable) else None)
    kb = key_col or (b.key_col if isinstance(b, LakeTable) else None)
    if ka is None or kb is None:
        raise ValueError("key_col required for plain DataFrames")
    if set(ta.columns) != set(tb.columns):
        raise ValueError(
            f"column sets differ — diff compares content, not schemas: "
            f"only in a: {sorted(set(ta.columns) - set(tb.columns))}, "
            f"only in b: {sorted(set(tb.columns) - set(ta.columns))}"
        )

    sa = bucket_signatures(a, ka, n_virtual).withColumnRenamed("sig", "sa") \
        .withColumnRenamed("n", "na")
    sb = bucket_signatures(b, kb, n_virtual).withColumnRenamed("sig", "sb") \
        .withColumnRenamed("n", "nb")
    j = sa.join(sb, "_vb", "full_outer")
    diverged = sorted(
        int(r["_vb"])
        for r in j.where(
            ~(F.col("sa").eqNullSafe(F.col("sb")) & F.col("na").eqNullSafe(F.col("nb")))
        ).collect()
    )
    if not diverged:
        empty = ta.limit(0)
        return {"diverged_vbuckets": [], "only_in_a": empty,
                "only_in_b": tb.limit(0)}

    def _slice(df, k):
        return df.where(
            F.pmod(F.xxhash64(F.col(k)), F.lit(n_virtual)).cast("int").isin(diverged)
        )

    ra, rb = _slice(ta, ka), _slice(tb, kb)
    return {
        "diverged_vbuckets": diverged,
        "only_in_a": ra.exceptAll(rb.select(*ra.columns)),
        "only_in_b": rb.exceptAll(ra.select(*rb.columns)),
    }


def repair(
    target: LakeTable, diff: dict, ts_col: str, lsn_col: str = "lsn",
    batch_id: int | None = None,
) -> dict | None:
    """Converge the TARGET (diff's ``b`` side) to the SOURCE (``a``):
    purge every diverged key on the target, then re-insert the source's
    rows through the normal fenced merge.

    Purge-then-insert rather than an upsert feed for a reason: a repair
    upsert must carry the source row's TRUE payload timestamp, and a
    value-drifted target row with a LATER timestamp would win LWW
    against it — silently keeping the corruption. Removing the diverged
    keys first makes the re-insert uncontested while keeping payload
    timestamps truthful. Diverged keys are collected to the driver (a
    repair set is small by definition — bulk divergence means re-sync
    with ``feed.sync_incremental`` instead); repair LSNs continue above
    the target's manifest maximum. Returns the merge snapshot, or None
    if the diff is empty."""
    from pyspark.sql import Window

    key = target.key_col
    a_rows, b_rows = diff["only_in_a"], diff["only_in_b"]
    bad = [
        r[0]
        for r in a_rows.select(key).union(b_rows.select(key)).distinct().collect()
    ]
    if not bad:
        return None
    target.purge_where(F.col(key).isin(bad))
    t = target.load()
    lsns = [e["lsn_max"] for e in t.manifest() if e.get("lsn_max") is not None]
    next_lsn = (max(lsns) + 1) if lsns else 1
    rn = F.row_number().over(Window.orderBy(F.col(key)))
    changes = (
        a_rows.withColumn("op", F.lit("U"))
        .withColumn(lsn_col, (rn + F.lit(next_lsn)).cast("bigint"))
    )
    from datax_spark.lake.merge import merge_into

    return merge_into(
        t, changes, ts_col=ts_col, lsn_col=lsn_col,
        stream_id="repair", batch_id=batch_id,
    )
