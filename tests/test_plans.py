"""Physical-plan regression tests: pin the plan SHAPES the engine's
scale story depends on (PLANS.md), so an optimizer-hostile refactor
shows up as a test failure, not a silent 10x.
"""

import pytest
from pyspark.sql import functions as F, types as T

from datax_spark.lake.merge import bulk_load, merge_into
from datax_spark.lake.table import LakeTable


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_change_scan_pushdown(spark):
    ch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    q = ch.filter(F.col("event_id") > 10_000).select("event_id", "user_id")
    plan = _plan(q)
    assert "PushedFilters" in plan and "GreaterThan(event_id" in plan
    # column pruning: the read schema must not include untouched columns
    assert "value" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_lww_dedup_partial_aggregate(spark):
    from datax_spark.lake.merge import lww_dedup

    ch = spark.createDataFrame(
        [(1, "I", "k", 1.0)], "lsn long, op string, url string, v double"
    ).withColumn("warc_ts", F.timestamp_seconds(F.lit(1704067200)))
    plan = _plan(lww_dedup(ch, "url", "warc_ts", "lsn"))
    # map-side combine: a partial max aggregate BEFORE the exchange
    assert "partial_max" in plan or "partial max" in plan.lower()
    assert plan.count("Exchange hashpartitioning(url") >= 1


def _mk_table(spark, root, nbuckets=4):
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    return LakeTable.create(spark, root, schema, key_col="url", num_buckets=nbuckets)


def _pages(spark, n):
    return spark.range(n).select(
        F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("warc_ts"),
        F.lit("en").alias("lang"),
    )


def test_mor_read_collapse_single_shuffle(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    bulk_load(t, _pages(spark, 200))
    ch = _pages(spark, 20).select(
        F.col("url"), (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")).alias("warc_ts"),
        F.lit("de").alias("lang"),
    ).withColumn("lsn", F.monotonically_increasing_id() + 1000).withColumn("op", F.lit("U"))
    merge_into(t, ch, merge_mode="mor")
    plan = _plan(t.read())
    # LWW collapse: exactly one exchange on the key, partial max present
    assert plan.count("Exchange hashpartitioning(url") == 1
    assert "partial_max" in plan or "partial max" in plan.lower()


def test_cow_read_has_no_collapse(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    bulk_load(t, _pages(spark, 200))
    plan = _plan(t.read())
    # base-only table: plain scan, no aggregate/exchange at all
    assert "Exchange" not in plan and "Aggregate" not in plan


def test_minhash_pair_exchange_drops_signatures(spark):
    from datax_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", jaccard_threshold=0.5)
    opt = _optimized(pairs)
    # the pair-dedup Deduplicate/Aggregate keys must be the slim
    # projection (id_a, id_b, jaccard_est) — not the sig arrays
    import re

    dedup_lines = [ln for ln in opt.split("\n") if "Aggregate [id_a" in ln or "Deduplicate" in ln]
    assert dedup_lines, opt
    assert all("sig_a" not in ln and "sig_b" not in ln for ln in dedup_lines)


def test_cow_union_merge_single_exchange_for_target_and_write(spark, tmp_path):
    """Round-3 plan pin: the CoW merge is union + LWW collapse; the
    touched-bucket TARGET scan flows through exactly ONE exchange (the
    bucket repartition), the collapse aggregate adds none (the bucket id
    is part of the grouping key, so the repartition satisfies its
    distribution), and the prepartitioned write adds none either. The
    only other exchange in a full merge is lww_dedup's batch-only
    shuffle, which this plan excludes (changes pre-deduped here)."""
    from datax_spark.lake.merge import cow_union_plan
    from datax_spark.lake.table import DELETED_COL, LSN_COL

    t = _mk_table(spark, str(tmp_path / "t"), nbuckets=4)
    bulk_load(t, _pages(spark, 200))
    delta = _pages(spark, 20).select(
        "url",
        (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")).alias("warc_ts"),
        F.lit("de").alias("lang"),
        (F.monotonically_increasing_id() + 1000).alias(LSN_COL),
        F.lit(False).alias(DELETED_COL),
    )
    plan_df = cow_union_plan(t, delta, [0, 1, 2, 3], t.schema(), "warc_ts")
    plan = _plan(plan_df)
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(_bucket" in plan
    # and the write path adds no shuffle on top (prepartitioned write is
    # a plain select of this plan)


def test_q6_scan_side_query_pushes_everything_down(spark):
    """Q6 is the pure scan query: date + quantity predicates reach the
    parquet reader, no join, single partial/final aggregate."""
    import __spark_entry__ as entry

    q = entry.queries()["q6_forecast_revenue"](spark, "/root/testdata/sf0.001")
    plan = _plan(q)
    pushed = plan.split("PushedFilters")[1].split("\n")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    assert "Join" not in plan
    # ReadSchema pruned to the four referenced columns
    rs = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_orderkey" not in rs and "l_returnflag" not in rs


def test_q14_broadcasts_the_dim(spark):
    import __spark_entry__ as entry

    q = entry.queries()["q14_promo_revenue"](spark, "/root/testdata/sf0.001")
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bucket_local_agg_has_no_exchange(spark, tmp_path):
    """Round-4 pin (VERDICT r3 next-round #3): per-key aggregation over
    the table's own bucket layout must NOT reshuffle — the plan of every
    per-bucket branch is Scan → Coalesce → MapInPandas, and the union
    carries no Exchange anywhere."""
    from datax_spark.lake.bucketed import bucket_local_agg, read_bucketed
    from datax_spark.lake.merge import merge_into

    t = _mk_table(spark, str(tmp_path / "t"))
    bulk_load(t, _pages(spark, 200))
    ch = _pages(spark, 40).select(
        "url", (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")).alias("warc_ts"),
        F.lit("de").alias("lang"),
    ).withColumn("lsn", F.monotonically_increasing_id() + 1000).withColumn("op", F.lit("U"))
    merge_into(t, ch, merge_mode="mor")

    agg = bucket_local_agg(
        t, {"n_versions": ("count", None), "last_ts": ("max", "warc_ts")},
        include_system=True, collapse=False,
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan and "Coalesce" in plan
    # correctness cross-check vs the exchange-ful reference aggregation
    ref = (t.read(include_system=True, collapse=False)
           .groupBy("url").agg(F.count("*").alias("n_versions"),
                               F.max("warc_ts").alias("last_ts")))
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, ref.collect()))
    # and the per-bucket reads cover disjoint key sets (bucket invariant)
    parts = read_bucketed(t, include_system=True, collapse=False)
    seen = set()
    for _b, df_b in parts:
        keys = {r[0] for r in df_b.select("url").distinct().collect()}
        assert not (keys & seen)
        seen |= keys


def test_scd2_snapshot_single_exchange(spark):
    """The SCD2 derivation is ONE key exchange (dedupe partial-agg rides
    the same partitioning as the window) — no second shuffle."""
    from datax_spark.cdc.scd2 import scd2_snapshot

    ch = spark.range(100).select(
        (F.col("id") % 10).cast("string").alias("k"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
        F.lit("v").alias("v"),
    )
    plan = _plan(scd2_snapshot(ch, "k"))
    assert plan.count("Exchange hashpartitioning(k") == 1, plan


def test_bloom_prune_no_exchange_on_big_side(spark):
    """The bloom probe is a scan-side FILTER: pruning must not shuffle
    the big side (positions computed in-line, bits tested in an Arrow
    UDF) — the whole point is that only survivors reach any exchange."""
    from datax_spark.operators.bloom import bloom_build, bloom_prune

    small = spark.range(100).select(F.col("id").alias("k"))
    bf = bloom_build(small, "k", num_bits=1 << 12)
    big = spark.range(10_000).select(F.col("id").alias("k"))
    plan = _plan(bloom_prune(big, bf, "k"))
    assert "Exchange" not in plan, plan


def test_heavy_hitters_candidate_filter_before_exchange(spark):
    """The CMS candidate filter must sit UNDER the exact-count exchange
    (tail rows eliminated before any shuffle)."""
    from datax_spark.operators.sketches import heavy_hitters

    df = spark.range(5_000).select((F.col("id") % 50).alias("k"))
    plan = _plan(heavy_hitters(df, ["k"], 10, width=1 << 12))
    # exactly one exchange (the exact count); the python eval (candidate
    # filter) appears below it in the tree
    assert plan.count("Exchange hashpartitioning(k") == 1, plan
    below_exchange = plan.split("Exchange hashpartitioning(k", 1)[1]
    assert "ArrowEvalPython" in below_exchange or "BatchEvalPython" in below_exchange, plan
