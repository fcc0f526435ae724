"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay end-to-end (events →
change stream → multi-batch fenced MERGE into a LakeTable) at sf0.001.
``queries()`` exposes the operator inventory over the driver's parquet
tables; ``oracle_sql()`` gives the DuckDB-checkable equivalent for every
SQL-expressible operator. Column names/types are aligned on both sides
(the driver hash-compares values after sorting columns by name).

CDC mapping used on the ``events`` table throughout: lsn=event_id,
key=user_id, op = signup→I / error→D / else U, event-time=ts — i.e. the
table is treated as a binlog tail, matching the engine's change algebra
(reference: otsstreamreader MultiVer/SingleVer op semantics).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# ---------------------------------------------------------------- helpers

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _as_changes(events: DataFrame) -> DataFrame:
    """events table → CDC change stream (lsn, op, key=user_id, ts, value)."""
    op = (
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return events.select(
        F.col("event_id").alias("lsn"),
        op.alias("op"),
        F.col("user_id"),
        # parquet stores ts as isAdjustedToUTC=false -> Spark reads
        # TIMESTAMP_NTZ; normalize to session-TZ timestamp (UTC session)
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_type"),
        F.col("value"),
    )


_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

_CH_SQL = """
  SELECT event_id AS lsn,
         CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
         user_id, ts, event_type, value
  FROM events
"""


# ---------------------------------------------------------------- flagship

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: bounded CDC replay into the from-scratch lake table.

    Splits the sf0.001 events-as-binlog into 4 LSN-ordered batches,
    applies each through quarantine → LWW dedup → fenced bucket-pruned
    MERGE, and returns the final live table (one row per surviving key).
    """
    from datax_spark.cdc.apply import apply_changes
    from datax_spark.lake.table import LakeTable

    sf_dir = "/root/testdata/sf0.001"
    changes = _as_changes(load(spark, sf_dir, "events"))
    root = os.path.join(tempfile.mkdtemp(prefix="datax_spark_entry_"), "pages")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    table = LakeTable.create(spark, root, schema, key_col="user_id", num_buckets=8)
    bounds = changes.agg(F.min("lsn"), F.max("lsn")).first()
    lo, hi = bounds[0], bounds[1]
    span = max(1, (hi - lo + 1) // 4)
    for b in range(4):
        batch = changes.filter(
            (F.col("lsn") >= lo + b * span)
            & (F.col("lsn") < (lo + (b + 1) * span if b < 3 else hi + 1))
        )
        apply_changes(table, batch, batch_id=b, ts_col="ts", lsn_col="lsn")
    return table.read()


# ---------------------------------------------------------------- queries

def _q_cdc_lww_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.lake.merge import lww_dedup

    ch = _as_changes(load(spark, sf_dir, "events"))
    win = lww_dedup(ch, "user_id", "ts", "lsn")
    return win.filter(F.col("op") != "D").select(
        "user_id",
        F.col("lsn").alias("last_lsn"),
        F.col("op").alias("last_op"),
        F.round("value", 4).alias("last_value"),
        F.date_format("ts", _TS_FMT_SPARK).alias("last_ts"),
    )


def _q_cdc_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.lake.merge import lww_dedup

    ch = _as_changes(load(spark, sf_dir, "events"))
    win = lww_dedup(ch, "user_id", "ts", "lsn")
    return win.filter(F.col("op") == "D").select("user_id", F.col("lsn").alias("last_lsn"))


def _q_cdc_op_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = _as_changes(load(spark, sf_dir, "events"))
    return ch.groupBy("op").agg(
        F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_keys")
    )


def _q_cdc_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose event-time regresses vs the previous LSN of the same
    key — the out-of-order slice the LWW guard must absorb."""
    from pyspark.sql import Window as W

    ch = _as_changes(load(spark, sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy("lsn")
    tagged = ch.withColumn("_prev_ts", F.lag("ts").over(w))
    return (
        tagged.filter(F.col("_prev_ts").isNotNull() & (F.col("ts") < F.col("_prev_ts")))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_ooo"))
    )


def _q_cdc_multiver_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiVerModeRecordSender analog: fan each change event out to one
    row per changed column (reference MultiVerModeRecordSender.java:41-65)."""
    ch = _as_changes(load(spark, sf_dir, "events"))
    cells = F.array(
        F.struct(F.lit("event_type").alias("col_name"), F.col("event_type").cast("string").alias("col_value")),
        F.struct(F.lit("value").alias("col_name"), F.round("value", 4).cast("string").alias("col_value")),
    )
    return (
        ch.filter(F.col("op") != "D")
        .select("user_id", "lsn", F.explode(cells).alias("cell"))
        .select("user_id", "lsn", F.col("cell.col_name").alias("col_name"), F.col("cell.col_value").alias("col_value"))
    )


def _q_cdc_cell_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-granular multi-version APPLY (reference
    MultiVerModeRecordSender.java:21-128 opTypes U/DO/DA/DR): decode the
    event stream into per-cell changes, then collapse to final rows with
    per-column latest-cell-wins + range tombstones. Closes round-2's
    whole-row-LWW gap (a partial-column update no longer clobbers
    untouched columns)."""
    from datax_spark.cdc.cells import collapse_cell_changes

    ch = _as_changes(load(spark, sf_dir, "events"))
    cells = ch.select(
        F.col("user_id").alias("pk"),
        F.when(F.col("lsn") % 3 == 0, "c0")
        .when(F.col("lsn") % 3 == 1, "c1")
        .otherwise("c2")
        .alias("col_name"),
        "ts",
        "lsn",
        F.when(F.col("lsn") % 10 <= 6, "U")
        .when(F.col("lsn") % 10 == 7, "DO")
        .when(F.col("lsn") % 10 == 8, "DA")
        .otherwise("DR")
        .alias("op"),
        F.concat_ws("_", F.col("event_type"), (F.col("lsn") % 100).cast("string")).alias("value"),
    )
    return collapse_cell_changes(cells, ["c0", "c1", "c2"])


def _q_dx_string_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.transformers import dx_pad, dx_replace, dx_substr

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        dx_substr(F.col("text"), 2, 12).alias("sub"),
        dx_pad(F.col("source"), "l", 8, "*").alias("padded"),
        dx_replace(F.col("lang"), 1, 1, "_X_").alias("repl"),
    )


def _q_dx_filter_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.transformers import dx_digest, dx_filter

    docs = load(spark, sf_dir, "documents")
    kept = dx_filter(docs, "n_chars", "<", 200)  # match ⇒ DROP (short docs dropped)
    return kept.select(
        "doc_id", dx_digest(F.col("text"), "md5", "toLowerCase").alias("digest")
    )


def _q_split_range_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.sources.split import split_id_expr

    li = load(spark, sf_dir, "lineitem")
    mn, mx = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    return (
        li.withColumn("split_id", split_id_expr(F.col("l_orderkey"), mn, mx, 8))
        .groupBy("split_id")
        .agg(F.count("*").alias("n_rows"), F.countDistinct("l_orderkey").alias("n_keys"))
    )


def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,6)")
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def _q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("o_orderdate") < F.lit("1995-03-15"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", F.date_format("o_orderdate", _TS_FMT_SPARK).alias("orderdate"), "revenue")
    )


def _q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 adaptation: revenue per nation where the supplier is in
    the customer's nation, region-filtered, one order-date year. Plan
    value: a 6-table join — dims broadcast, one fact-fact shuffle."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter((F.col("r_name") == "ASIA")
                & (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01")))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def _q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 adaptation: the pure scan-side query — every predicate
    and the aggregate must reach the parquet reader (pushdown + a single
    partial/final agg, no join, no wide shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * F.col("l_discount").cast("decimal(18,2)")).cast("decimal(28,6)")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01"))
                  & (F.col("l_discount").cast("decimal(18,2)").between(
                      F.lit("0.05").cast("decimal(18,2)"), F.lit("0.07").cast("decimal(18,2)")))
                  & (F.col("l_quantity") < 24))
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count("*").alias("n_items"))
    )


def _q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 adaptation: promo revenue share — conditional aggregate
    over a fact⋈broadcast-dim join, one month of shipments."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,6)")
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0).cast("decimal(28,6)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter((F.col("l_shipdate") >= F.lit("1996-03-01"))
                & (F.col("l_shipdate") < F.lit("1996-04-01")))
        .agg((F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"))
             .alias("promo_pct"),
             F.sum(rev).cast("double").alias("total_revenue"))
    )


def _q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adaptation: top-20 customers by revenue lost to
    returned items in one quarter."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .filter((F.col("l_returnflag") == "R")
                & (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1996-04-01")))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def _q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 adaptation: orders whose total quantity exceeds the
    threshold, with customer context — the aggregate-then-semijoin shape."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_tq"))
        .filter(F.col("_tq") > 300)
        .select(F.col("l_orderkey").alias("_bigkey"))
    )
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("_bigkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey",
                 F.date_format("o_orderdate", _TS_FMT_SPARK).alias("orderdate"),
                 F.round("o_totalprice", 2).alias("totalprice"))
        .agg(F.sum(qty).cast("double").alias("total_qty"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def _q_window_customer_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rk")
    )


def _q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.text import token_count, wordpunct_token_count

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        wordpunct_token_count(F.col("text")).alias("n_wp_tokens"),
    )


def _q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.text import alpha_ratio, punct_ratio, token_count

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(alpha_ratio(F.col("text")), 6).alias("alpha_ratio"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        token_count(F.col("text")).alias("n_tokens"),
    )


def _q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.text import fingerprint64

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint64(F.col("text")).alias("fp"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.dedup import exact_dedup

    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


def _q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.dedup import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "text", "doc_id", k_shingle=3, threshold=0.5)


def _q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=32, bands=8, jaccard_threshold=0.5)


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.dedup import simhash64

    docs = load(spark, sf_dir, "documents")
    return simhash64(docs, "text", "doc_id")


def _q_dedup_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.dedup import simhash_near_pairs

    docs = load(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, "text", "doc_id", radius=3)


def _q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return cosine_topk(emb, queries, k=10)


def _q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.similarity import cosine_topk_lsh

    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return cosine_topk_lsh(emb, queries, dim=dim, k=10)


def _q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.similarity import cosine_topk_ivf

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return cosine_topk_ivf(emb, queries, k=10, n_centroids=16, n_probe=4)


def _q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): 8 subspaces × 16
    codes = 8-byte codes for 64-dim vectors (32× compression); encode +
    ADC scoring fuse into one corpus pass, exchange ≤ k·Q rows/batch."""
    from datax_spark.operators.pq import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    return pq_topk(emb, queries, k=10, m=8, n_codes=16)


def _q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured PQ recall@10 vs exact L2 — the acceptance metric ships
    WITH the approximate operator."""
    from datax_spark.operators.pq import pq_recall

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    r = pq_recall(emb, queries, k=10, m=8, n_codes=16)
    return spark.createDataFrame([(5, float(r))], "n_queries int, recall double")


def _q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (brute-force) cosine near-dup pairs — oracle-checkable; the
    LSH-bucketed variant is the scale path (rows-only)."""
    from datax_spark.operators.similarity import cosine

    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(cosine(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")), 4),
        )
        .filter(F.col("cosine") >= 0.95)
        .select("id_a", "id_b", "cosine")
    )


def _q_emb_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path with its own oracle row: LSH-bucketed near-dup
    pairs (single hyperplane-signature table, exact-cosine verify within
    buckets) vs an independent pure-python reference
    (oracle/pyref.py::emb_near_dup_lsh_rows)."""
    from datax_spark.operators.similarity import embedding_near_dup_pairs

    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    # threshold/planes sized to the driver fixture: the synthetic 64-dim
    # embeddings are near-orthogonal (no >=0.95 pairs exist), so the
    # production default would make this oracle row vacuously empty
    return embedding_near_dup_pairs(emb, dim=dim, threshold=0.3, num_planes=8)


def _q_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.sources.synthetic import stream_source

    return stream_source(
        spark,
        slice_record_count=10,
        channels=5,
        columns=[
            {"type": "string", "value": "DataX", "name": "c0"},
            {"type": "long", "value": 1724154616370, "name": "c1"},
            {"type": "date", "value": "2024-01-01 00:00:00", "name": "c2"},
            {"type": "bool", "value": "true", "name": "c3"},
        ],
    ).select("c0", "c1", F.date_format("c2", _TS_FMT_SPARK).alias("c2"), "c3")


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.multimodal import extract_features, synthetic_media

    return extract_features(synthetic_media(spark, 200))


def _q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (1 video row → N frame rows) — the engine's
    UDTF-style surface (SURVEY §2.9); frames hex-encoded for comparison."""
    from datax_spark.operators.multimodal import sample_frames, synthetic_media

    return sample_frames(synthetic_media(spark, 120), every_ms=1000).select(
        "media_id", "frame_idx", F.hex(F.col("frame")).alias("frame_hex")
    )


def _q_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode kernels (round 3): BMP/WAV/DXV payloads encoded from the
    documented content formula, decoded back by the pure-numpy codecs, with
    pixel/sample statistics — oracle recomputes stats from the formula."""
    from datax_spark.operators.multimodal import decode_features, synthetic_media_encoded

    return decode_features(synthetic_media_encoded(spark, 120))


def _q_media_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real frame fan-out over DXV containers: per-frame luminance + 4×4
    nearest-neighbour thumbnail checksum (pins the resize kernel)."""
    from datax_spark.operators.multimodal import decode_video_frames, synthetic_media_encoded

    return decode_video_frames(synthetic_media_encoded(spark, 120))


def _q_dedup_minhash_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.operators.dedup import minhash_lsh_dedup

    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_dedup(
        docs, "text", "doc_id", k_shingle=3, num_hashes=32, bands=8,
        jaccard_threshold=0.5,
    ).select("doc_id")


def _q_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.text import quality_score

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH recall@10 vs exact brute force — the ANN acceptance
    metric as a first-class query (the approximate operator ships WITH
    its quality measurement)."""
    from datax_spark.operators.similarity import lsh_recall

    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    r = lsh_recall(emb, queries, dim=dim, k=10)
    return spark.createDataFrame([(5, float(r))], "n_queries int, recall double")


def _q_events_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.cdc.windows import windowed_change_counts

    ch = _as_changes(load(spark, sf_dir, "events")).withColumnRenamed("ts", "warc_ts")
    w = windowed_change_counts(ch, ts_col="warc_ts", window_duration="1 hour")
    return w.select(
        F.date_format("window_start", _TS_FMT_SPARK).alias("window_start"), "op", "n_events"
    )


def _q_cdc_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize each key's change history with a 30-minute gap rule —
    cumulative-sum-over-lag windowing (the advanced window surface)."""
    from pyspark.sql import Window as W

    ch = _as_changes(load(spark, sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy("ts", "lsn")
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800).cast("int")
    sess = ch.withColumn("new_sess", F.coalesce(gap, F.lit(1)))
    return sess.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events")
    )


def _q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.text import lang_id

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_id"))


def _q_doc_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.text import stopword_ratio

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(stopword_ratio(F.col("text"), "en"), 6).alias("sw_ratio"))


def _q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n", "total",
        )
    )


def _q_setops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    frequent = (
        orders.groupBy("o_custkey").agg(F.count("*").alias("n")).filter("n >= 4").select("o_custkey")
    )
    big = orders.filter(F.col("o_totalprice") > 300000).select("o_custkey").distinct()
    return frequent.subtract(big).select(F.col("o_custkey").alias("custkey"))


def _q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data pipeline: quality-score filter → exact
    near-dup collapse (min doc_id per normalized-content class) →
    per-language corpus stats. The shape a 100 TB curation run takes:
    scan-side projections, one dedup shuffle, one stats aggregate."""
    from datax_spark.functions.text import lang_id, quality_score
    from datax_spark.operators.dedup import exact_dedup

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "text",
        quality_score(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("lid"),
    ).filter(F.col("q") >= 0.5)
    keep = exact_dedup(scored, "text", "doc_id")
    return (
        scored.join(keep, "doc_id")
        .groupBy("lid")
        .agg(
            F.count("*").alias("n_docs"),
            # decimal-sum/count instead of avg(): associative, so the
            # result is independent of partitioning (q is 4-decimal)
            F.round(
                F.sum(F.col("q").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_quality"),
        )
    )


def _q_asof_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each event gets the user's most recent
    order at-or-before the event timestamp (operators/asof.py — the
    union-scan plan, one exchange, no O(matches) blow-up). Oracle:
    DuckDB ASOF LEFT JOIN over a tie-broken order snapshot."""
    from datax_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice")
    out = asof_join(
        ev, orders, on=["user_id"], left_ts="ts", right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"], right_tiebreak="o_orderkey")
    return out.select(
        "event_id", "user_id", F.date_format("ts", _TS_FMT_SPARK).alias("event_ts"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"))


def _q_range_join_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval containment via the binned range join
    (operators/ranges.py): every ~97th event opens a 15-minute window;
    count all events landing inside each window. Spark's native plan for
    this predicate is BroadcastNestedLoopJoin (O(P·I)); the bin trick
    turns it into an equi-join. Comparison runs at microsecond precision
    (unix_micros) so sub-second boundaries match the oracle's
    full-precision timestamp compare. Oracle: DuckDB IEJoin on the plain
    non-equi form."""
    from datax_spark.operators.ranges import interval_join_binned

    ev = load(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; cast through the session's pinned-UTC zone —
    # a fixed-offset monotonic map, so containment is precision-exact.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = ev.select(us.alias("p"), "event_id")
    win_us = 900 * 1_000_000
    iv = ev.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("window_id"), us.alias("s"),
        (us + win_us).alias("e"))
    j = interval_join_binned(pts, iv, "p", "s", "e", bin_width=win_us)
    return j.groupBy("window_id").agg(
        F.count("*").alias("n_events"), F.sum("event_id").alias("sum_event_id"))


def _shard_tail_fixture() -> str:
    """Deterministic 3-shard × 2-file log-tail fixture under the system
    temp dir (built once, atomic rename to dodge concurrent builders)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = os.path.join(tempfile.gettempdir(), "datax_shard_tail_fixture_v1")
    if os.path.isdir(root):
        return root
    tmp = root + f".build{os.getpid()}"
    for s in range(3):
        d = os.path.join(tmp, f"shard={s}")
        os.makedirs(d, exist_ok=True)
        for fi in range(2):
            lsns = list(range(s * 100_000 + fi * 50, s * 100_000 + fi * 50 + 50))
            t = pa.table({
                "lsn": pa.array(lsns, pa.int64()),
                "op": pa.array(["I" if v % 10 < 8 else "U" for v in lsns]),
                "url": pa.array([f"http://s{s}.example/{v % 37}" for v in lsns]),
            })
            pq.write_table(t, os.path.join(d, f"f{fi:04d}.parquet"))
    try:
        os.rename(tmp, root)
    except OSError:  # another process won the race
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return root


def _q_shard_tail_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sharded log-tail Python DataSource (sources/shardtail.py —
    the loghub/datahub/OTS-stream reader analog, SURVEY §2.2 #14) read
    in batch mode: one partition per shard, footer-only planning. Oracle:
    DuckDB reads the identical shard files directly, checking the
    source's slicing/assembly end-to-end."""
    from datax_spark.sources.shardtail import register_shard_tail

    root = _shard_tail_fixture()
    register_shard_tail(spark)
    df = spark.read.format("shard_tail").option("path", root).load()
    return df.groupBy("op").agg(
        F.count("*").alias("n_rows"), F.sum("lsn").alias("sum_lsn"),
        F.count_distinct("url").alias("n_urls"))


def _q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization groups (functions/urls.py) over a
    deterministic messy-URL fixture — scheme/host case, trailing
    slashes, shuffled query params, fragments all collapse; oracle
    recomputes with an independent pure-python canonicalizer."""
    from datax_spark.functions.urls import canonicalize_url

    rows = []
    for i in range(200):
        j = i // 2  # pair (2j, 2j+1): same logical URL, different mess
        scheme = "HTTPS" if j % 5 == 0 else "http"
        host = f"site{j % 7}.example.com"
        if i % 3 == 0:
            host = host.upper()
        path = f"/a/b{j % 11}" + "/" * (i % 3)
        params = []
        if j % 9 != 0:
            params = [f"x={j % 13}", f"y={j % 4}"]
            if j % 4 == 0:
                params.append(f"utm_source=t{j % 5}")
            if i % 2 == 0:
                params.reverse()
        url = f"{scheme}://{host}{path}"
        if params:
            url += "?" + "&".join(params)
        if i % 6 == 0:
            url += "#frag"
        rows.append((i, url))
    df = spark.createDataFrame(rows, "url_id long, url string")
    return (df.withColumn("canon", canonicalize_url(F.col("url")))
            .groupBy("canon")
            .agg(F.count("*").alias("n_urls"), F.min("url_id").alias("min_id")))


def _q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self unigram LM score (functions/text.py::unigram_logprob)
    — mean log-prob per doc under the corpus' Laplace-smoothed unigram
    distribution; decimal term-sums keep it partition-order-exact."""
    from datax_spark.functions.text import unigram_logprob

    docs = load(spark, sf_dir, "documents")
    return unigram_logprob(docs, "text", "doc_id")


def _q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontaminate.py): flag
    corpus documents sharing any 4-gram with a pseudo-benchmark set
    (doc_id % 101 == 0); reference grams broadcast, corpus never
    shuffles its text."""
    from datax_spark.operators.decontaminate import flag_ngram_contamination

    docs = load(spark, sf_dir, "documents")
    reference = docs.filter(F.col("doc_id") % 101 == 0)
    corpus = docs.filter(F.col("doc_id") % 101 != 0)
    return flag_ngram_contamination(corpus, reference, n=4)


def _q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling (corpus rebalancing:
    heavy languages downsampled, rare ones kept) —
    operators/sampling.py::sample_stratified."""
    from datax_spark.operators.sampling import sample_stratified

    docs = load(spark, sf_dir, "documents")
    out = sample_stratified(
        docs, ["text"], "lang",
        fractions={"en": 0.3, "de": 0.8}, default_fraction=1.0)
    return out.groupBy("lang").agg(
        F.count("*").alias("n_rows"), F.sum("doc_id").alias("sum_ids"))


def _q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (functions/text.py::
    repetition_signals): distinct-word ratio + top word/bigram dominance
    — the templated-page filters of web-corpus curation."""
    from datax_spark.functions.text import repetition_signals

    docs = load(spark, sf_dir, "documents")
    return repetition_signals(docs, "text", "doc_id")


def _q_doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-keyed train/val/test split
    (operators/sampling.py::hash_split) — reproducible across runs,
    partitionings, and engines; oracle recomputes the xxh64 buckets."""
    from datax_spark.operators.sampling import hash_split

    docs = load(spark, sf_dir, "documents")
    out = hash_split(docs, ["text"], {"train": 0.8, "val": 0.1, "test": 0.1})
    return out.groupBy("split").agg(
        F.count("*").alias("n_rows"), F.sum("n_chars").alias("sum_chars"))


def _q_sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV k-minimum-values distinct estimate over document texts
    (operators/sketches.py) — a deterministic, oracle-auditable
    alternative to HLL: the pure-python xxh64 reference recomputes the
    identical sketch state and estimate."""
    from datax_spark.operators.sketches import kmv_distinct

    docs = load(spark, sf_dir, "documents")
    return kmv_distinct(docs, ["text"], k=128)


def _q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select("c_custkey")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_lww_final_state": _q_cdc_lww_final_state,
        "cdc_tombstones": _q_cdc_tombstones,
        "cdc_op_mix": _q_cdc_op_mix,
        "cdc_out_of_order": _q_cdc_out_of_order,
        "cdc_multiver_fanout": _q_cdc_multiver_fanout,
        "cdc_cell_merge": _q_cdc_cell_merge,
        "dx_string_transforms": _q_dx_string_transforms,
        "dx_filter_digest": _q_dx_filter_digest,
        "split_range_assign": _q_split_range_assign,
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_shipping": _q3_shipping,
        "q5_local_supplier": _q5_local_supplier,
        "q6_forecast_revenue": _q6_forecast_revenue,
        "q14_promo_revenue": _q14_promo_revenue,
        "q10_returned_items": _q10_returned_items,
        "q18_large_orders": _q18_large_orders,
        "window_customer_rank": _q_window_customer_rank,
        "doc_token_stats": _q_doc_token_stats,
        "doc_quality": _q_doc_quality,
        "doc_fingerprint": _q_doc_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_simhash_near": _q_dedup_simhash_near,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_pq_topk": _q_ann_pq_topk,
        "ann_pq_recall": _q_ann_pq_recall,
        "emb_near_dup": _q_emb_near_dup,
        "emb_near_dup_lsh": _q_emb_near_dup_lsh,
        "stream_source_const": _q_stream_source,
        "media_features": _q_media_features,
        "media_frames": _q_media_frames,
        "media_decode_features": _q_media_decode_features,
        "media_video_frames": _q_media_video_frames,
        "dedup_minhash_keep": _q_dedup_minhash_keep,
        "doc_quality_score": _q_doc_quality_score,
        "ann_recall": _q_ann_recall,
        "events_windowed_counts": _q_events_windowed_counts,
        "cdc_session_gaps": _q_cdc_session_gaps,
        "doc_lang_id": _q_doc_lang_id,
        "doc_stopword_ratio": _q_doc_stopword_ratio,
        "corpus_curation": _q_corpus_curation,
        "rollup_orders": _q_rollup_orders,
        "setops_custkeys": _q_setops_custkeys,
        "customers_without_orders": _q_customers_without_orders,
        "asof_enrich_events": _q_asof_enrich_events,
        "range_join_event_windows": _q_range_join_event_windows,
        "sketch_kmv_distinct": _q_sketch_kmv_distinct,
        "shard_tail_read": _q_shard_tail_read,
        "doc_hash_split": _q_doc_hash_split,
        "doc_repetition": _q_doc_repetition,
        "doc_stratified_sample": _q_doc_stratified_sample,
        "doc_decontaminate": _q_doc_decontaminate,
        "doc_unigram_logprob": _q_doc_unigram_logprob,
        "url_canonicalize": _q_url_canonicalize,
    }


def oracle_sql() -> dict[str, str]:
    ch = _CH_SQL
    return {
        "cdc_lww_final_state": f"""
            WITH ch AS ({ch}),
            r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, lsn DESC) rn FROM ch)
            SELECT user_id, lsn AS last_lsn, op AS last_op, round(value, 4) AS last_value,
                   strftime(ts, '{_TS_FMT_DUCK}') AS last_ts
            FROM r WHERE rn = 1 AND op <> 'D'
        """,
        "cdc_tombstones": f"""
            WITH ch AS ({ch}),
            r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, lsn DESC) rn FROM ch)
            SELECT user_id, lsn AS last_lsn FROM r WHERE rn = 1 AND op = 'D'
        """,
        "cdc_op_mix": f"""
            WITH ch AS ({ch})
            SELECT op, count(*) AS n_events, count(DISTINCT user_id) AS n_keys FROM ch GROUP BY op
        """,
        "cdc_out_of_order": f"""
            WITH ch AS ({ch}),
            l AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY lsn) AS prev_ts FROM ch)
            SELECT user_id, count(*) AS n_ooo FROM l
            WHERE prev_ts IS NOT NULL AND ts < prev_ts GROUP BY user_id
        """,
        "cdc_multiver_fanout": f"""
            WITH ch AS ({ch})
            SELECT user_id, lsn, 'event_type' AS col_name, CAST(event_type AS VARCHAR) AS col_value
            FROM ch WHERE op <> 'D'
            UNION ALL
            SELECT user_id, lsn, 'value' AS col_name, CAST(round(value, 4) AS VARCHAR) AS col_value
            FROM ch WHERE op <> 'D'
        """,
        "cdc_cell_merge": f"""
            WITH ch AS ({ch}),
            cells AS (
              SELECT user_id AS pk,
                     CASE CAST(lsn % 3 AS INT) WHEN 0 THEN 'c0' WHEN 1 THEN 'c1' ELSE 'c2' END AS col_name,
                     ts, lsn,
                     CASE WHEN lsn % 10 <= 6 THEN 'U' WHEN lsn % 10 = 7 THEN 'DO'
                          WHEN lsn % 10 = 8 THEN 'DA' ELSE 'DR' END AS op,
                     event_type || '_' || CAST(lsn % 100 AS VARCHAR) AS value
              FROM ch
            ),
            ver AS (  -- per-version winner among U/DO: max lsn (log causality)
              SELECT pk, col_name, ts, lsn, op, value,
                     row_number() OVER (PARTITION BY pk, col_name, ts ORDER BY lsn DESC) AS rn
              FROM cells WHERE op IN ('U', 'DO')
            ),
            alive AS (
              SELECT pk, col_name, ts, lsn, value,
                     row_number() OVER (PARTITION BY pk, col_name ORDER BY ts DESC, lsn DESC) AS wrn
              FROM ver WHERE rn = 1 AND op = 'U'
            ),
            da AS (
              SELECT pk, col_name, ts AS dts, lsn AS dlsn FROM (
                SELECT pk, col_name, ts, lsn,
                       row_number() OVER (PARTITION BY pk, col_name ORDER BY ts DESC, lsn DESC) AS rn
                FROM cells WHERE op = 'DA') WHERE rn = 1
            ),
            dr AS (
              SELECT pk, ts AS rts, lsn AS rlsn FROM (
                SELECT pk, ts, lsn,
                       row_number() OVER (PARTITION BY pk ORDER BY ts DESC, lsn DESC) AS rn
                FROM cells WHERE op = 'DR') WHERE rn = 1
            ),
            surv AS (
              SELECT a.pk, a.col_name, a.value
              FROM alive a
              LEFT JOIN da ON a.pk = da.pk AND a.col_name = da.col_name
              LEFT JOIN dr ON a.pk = dr.pk
              WHERE a.wrn = 1
                AND (da.dts IS NULL OR (a.ts, a.lsn) > (da.dts, da.dlsn))
                AND (dr.rts IS NULL OR (a.ts, a.lsn) > (dr.rts, dr.rlsn))
            )
            SELECT pk,
                   max(CASE WHEN col_name = 'c0' THEN value END) AS c0,
                   max(CASE WHEN col_name = 'c1' THEN value END) AS c1,
                   max(CASE WHEN col_name = 'c2' THEN value END) AS c2
            FROM surv GROUP BY pk
        """,
        "dx_string_transforms": """
            SELECT doc_id,
                   substr(text, 3, 12) AS sub,
                   CASE WHEN length(source) >= 8 THEN substr(source, 1, 8)
                        ELSE repeat('*', 8 - length(source)) || source END AS padded,
                   substr(lang, 1, 1) || '_X_' ||
                     CASE WHEN length(lang) > 2 THEN substr(lang, 3) ELSE '' END AS repl
            FROM documents
        """,
        "dx_filter_digest": """
            SELECT doc_id, lower(md5(text)) AS digest FROM documents WHERE NOT (n_chars < 200)
        """,
        "split_range_assign": """
            WITH b AS (SELECT min(l_orderkey) mn, max(l_orderkey) mx FROM lineitem),
            p AS (SELECT mn, (mx - mn + 1) // 8 AS base, (mx - mn + 1) % 8 AS rem FROM b)
            SELECT CAST(CASE WHEN (l_orderkey - mn) < rem * (base + 1)
                             THEN (l_orderkey - mn) // (base + 1)
                             ELSE rem + ((l_orderkey - mn) - rem * (base + 1)) // base
                        END AS INT) AS split_id,
                   count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_keys
            FROM lineitem, p GROUP BY 1
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping": f"""
            SELECT l_orderkey, strftime(o_orderdate, '{_TS_FMT_DUCK}') AS orderdate,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
            WHERE o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "q5_local_supplier": """
            SELECT n_name,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
                          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                          JOIN nation ON s_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC
        """,
        "q6_forecast_revenue": """
            SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST('0.05' AS DECIMAL(18,2)) AND CAST('0.07' AS DECIMAL(18,2))
              AND l_quantity < 24
        """,
        "q14_promo_revenue": """
            WITH j AS (
              SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)) AS rev,
                     p_type
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            )
            SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                     / CAST(sum(rev) AS DOUBLE) AS promo_pct,
                   CAST(sum(rev) AS DOUBLE) AS total_revenue
            FROM j
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, n_name,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
                          JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey ASC LIMIT 20
        """,
        "q18_large_orders": f"""
            WITH big AS (
              SELECT l_orderkey FROM lineitem
              GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
            )
            SELECT c_custkey, c_name, o_orderkey,
                   strftime(o_orderdate, '{_TS_FMT_DUCK}') AS orderdate,
                   round(o_totalprice, 2) AS totalprice,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
            FROM lineitem JOIN big USING (l_orderkey)
                          JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
            ORDER BY totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "window_customer_rank": """
            WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
                              row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) rk
                       FROM orders)
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk FROM r WHERE rk <= 2
        """,
        "doc_token_stats": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
                        ELSE len(string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), '\s+')) END AS n_tokens,
                   len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS n_wp_tokens
            FROM documents
        """,
        "doc_quality": r"""
            SELECT doc_id,
                   round(CASE WHEN length(text) > 0
                         THEN (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0 / length(text)
                         ELSE 0 END, 6) AS alpha_ratio,
                   round(CASE WHEN length(text) > 0
                         THEN (length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}\-]', '', 'g'))) * 1.0 / length(text)
                         ELSE 0 END, 6) AS punct_ratio,
                   CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
                        ELSE len(string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), '\s+')) END AS n_tokens
            FROM documents
        """,
        "dedup_exact": r"""
            SELECT min(doc_id) AS doc_id
            FROM documents
            GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        """,
        "dedup_ngram_jaccard": r"""
            WITH words AS (
              SELECT doc_id, string_split_regex(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS w
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       array_to_string(w[i:i+2], ' ') AS s
                FROM words, LATERAL unnest(generate_series(1, len(w) - 2)) AS t(i)
                WHERE len(w) >= 3
                UNION ALL
                SELECT doc_id, array_to_string(w, ' ') AS s FROM words WHERE len(w) < 3
              )
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.qid, e.vec_id,
                     round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])), 4) AS cosine
              FROM embeddings e CROSS JOIN q
            ),
            r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rank FROM scored)
            SELECT qid, vec_id, cosine, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10
        """,
        "emb_near_dup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a CROSS JOIN embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.95
        """,
        "stream_source_const": """
            SELECT 'DataX' AS c0, CAST(1724154616370 AS BIGINT) AS c1,
                   '2024-01-01 00:00:00' AS c2, true AS c3
            FROM range(50)
        """,
        "events_windowed_counts": f"""
            WITH ch AS ({ch})
            SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
                   op, count(*) AS n_events
            FROM ch GROUP BY 1, 2
        """,
        "cdc_session_gaps": f"""
            WITH ch AS ({ch}),
            l AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, lsn) AS prev
                  FROM ch),
            s AS (SELECT user_id,
                         CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800 THEN 1 ELSE 0 END AS new_sess
                  FROM l)
            SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
            FROM s GROUP BY user_id
        """,
        "doc_quality_score": r"""
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
                          ELSE len(string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), '\s+')) END AS n_tok,
                     CASE WHEN length(text) > 0
                          THEN (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0 / length(text)
                          ELSE 0 END AS alpha,
                     CASE WHEN length(text) > 0
                          THEN (length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}\-]', '', 'g'))) * 1.0 / length(text)
                          ELSE 0 END AS punct,
                     string_split_regex(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS w
              FROM documents
            ),
            sw AS (
              SELECT doc_id, n_tok, alpha, punct,
                     CASE WHEN len(w) > 0 THEN
                       len(list_filter(w, x -> list_contains(['the','and','of','to','in','is','that','it','for','was'], x))) * 1.0 / len(w)
                     ELSE 0 END AS swr
              FROM base
            )
            SELECT doc_id,
                   round(0.4 * least(n_tok / 100.0, 1.0)
                       + 0.3 * alpha
                       + 0.2 * least(swr * 4, 1.0)
                       + 0.1 * (1.0 - least(punct * 5, 1.0)), 4) AS quality
            FROM sw
        """,
        "doc_lang_id": r"""
            WITH words AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS w
              FROM documents
            ),
            hits AS (
              SELECT doc_id,
                len(list_filter(w, x -> list_contains(['the','and','of','to','in','is','that','it','for','was'], x))) AS en,
                len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','von','zu'], x))) AS de,
                len(list_filter(w, x -> list_contains(['le','la','les','et','est','une','des','dans','pour','que'], x))) AS fr,
                len(list_filter(w, x -> list_contains(['el','la','los','las','y','es','una','del','para','por'], x))) AS es,
                len(list_filter(w, x -> list_contains(['的','是','在','了','和','有','我','他','这','们'], x))) AS zh
              FROM words
            )
            SELECT doc_id,
                   CASE WHEN greatest(en,de,fr,es,zh) = 0 THEN 'und'
                        WHEN en >= de AND en >= fr AND en >= es AND en >= zh THEN 'en'
                        WHEN de >= fr AND de >= es AND de >= zh THEN 'de'
                        WHEN fr >= es AND fr >= zh THEN 'fr'
                        WHEN es >= zh THEN 'es'
                        ELSE 'zh' END AS lang_id
            FROM hits
        """,
        "doc_stopword_ratio": r"""
            WITH words AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS w
              FROM documents
            )
            SELECT doc_id,
                   round(CASE WHEN len(w) > 0 THEN
                     len(list_filter(w, x -> list_contains(['the','and','of','to','in','is','that','it','for','was'], x))) * 1.0 / len(w)
                   ELSE 0 END, 6) AS sw_ratio
            FROM words
        """,
        "corpus_curation": r"""
            WITH base AS (
              SELECT doc_id, text,
                     CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
                          ELSE len(string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), '\s+')) END AS n_tok,
                     CASE WHEN length(text) > 0
                          THEN (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0 / length(text)
                          ELSE 0 END AS alpha,
                     CASE WHEN length(text) > 0
                          THEN (length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}\-]', '', 'g'))) * 1.0 / length(text)
                          ELSE 0 END AS punct,
                     string_split_regex(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS w
              FROM documents
            ),
            scored AS (
              SELECT doc_id, text, w,
                     round(0.4 * least(n_tok / 100.0, 1.0)
                         + 0.3 * alpha
                         + 0.2 * least((CASE WHEN len(w) > 0 THEN
                             len(list_filter(w, x -> list_contains(['the','and','of','to','in','is','that','it','for','was'], x))) * 1.0 / len(w)
                           ELSE 0 END) * 4, 1.0)
                         + 0.1 * (1.0 - least(punct * 5, 1.0)), 4) AS q
              FROM base
            ),
            filtered AS (SELECT * FROM scored WHERE q >= 0.5),
            keep AS (
              SELECT min(doc_id) AS doc_id
              FROM filtered
              GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
            ),
            hits AS (
              SELECT f.doc_id, f.q,
                len(list_filter(f.w, x -> list_contains(['the','and','of','to','in','is','that','it','for','was'], x))) AS en,
                len(list_filter(f.w, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','von','zu'], x))) AS de,
                len(list_filter(f.w, x -> list_contains(['le','la','les','et','est','une','des','dans','pour','que'], x))) AS fr,
                len(list_filter(f.w, x -> list_contains(['el','la','los','las','y','es','una','del','para','por'], x))) AS es,
                len(list_filter(f.w, x -> list_contains(['的','是','在','了','和','有','我','他','这','们'], x))) AS zh
              FROM filtered f JOIN keep k ON f.doc_id = k.doc_id
            ),
            labeled AS (
              SELECT doc_id, q,
                     CASE WHEN greatest(en,de,fr,es,zh) = 0 THEN 'und'
                          WHEN en >= de AND en >= fr AND en >= es AND en >= zh THEN 'en'
                          WHEN de >= fr AND de >= es AND de >= zh THEN 'de'
                          WHEN fr >= es AND fr >= zh THEN 'fr'
                          WHEN es >= zh THEN 'es'
                          ELSE 'zh' END AS lid
              FROM hits
            )
            SELECT lid, count(*) AS n_docs,
                   round(CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_quality
            FROM labeled GROUP BY lid
        """,
        "rollup_orders": """
            SELECT coalesce(o_orderpriority, 'ALL') AS priority,
                   coalesce(o_orderstatus, 'ALL') AS status,
                   count(*) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """,
        "setops_custkeys": """
            SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 4
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000
        """,
        "customers_without_orders": """
            SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "asof_enrich_events": f"""
            WITH r AS (
              SELECT o_custkey AS user_id, o_orderdate,
                     max(o_orderkey) AS last_orderkey,
                     arg_max(o_totalprice, o_orderkey) AS last_totalprice
              FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id,
                   strftime(e.ts, '{_TS_FMT_DUCK}') AS event_ts,
                   r.last_orderkey, r.last_totalprice
            FROM events e ASOF LEFT JOIN r
              ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
        """,
        "range_join_event_windows": """
            SELECT i.event_id AS window_id, count(*) AS n_events,
                   sum(e.event_id) AS sum_event_id
            FROM events i JOIN events e
              ON e.ts >= i.ts AND e.ts < i.ts + INTERVAL 15 MINUTE
            WHERE i.event_id % 97 = 0
            GROUP BY 1
        """,
        # Hash-family-specific / approximate operators: DuckDB has no
        # xxhash64, so the oracle is an independent pure-python reference
        # implementation (datax_spark/oracle/pyref.py — shares no code
        # with the Spark plans) materialized as a VALUES relation. The
        # driver still value-compares Spark vs DuckDB row-by-row.
        **_pyref_oracles(),
    }


def _pyref_oracles() -> dict[str, str]:
    from datax_spark.oracle import pyref

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return {
        "doc_fingerprint": pyref.values_sql(
            pyref.fingerprint_rows(sf_dir),
            [("doc_id", "BIGINT"), ("fp", "BIGINT")],
        ),
        "dedup_minhash_lsh": pyref.values_sql(
            pyref.minhash_pairs_rows(sf_dir, k_shingle=3, num_hashes=32, bands=8, threshold=0.5),
            [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("jaccard_est", "DOUBLE")],
        ),
        "dedup_simhash": pyref.values_sql(
            pyref.simhash_rows(sf_dir),
            [("id", "BIGINT"), ("simhash", "BIGINT")],
        ),
        "dedup_simhash_near": pyref.values_sql(
            pyref.simhash_near_rows(sf_dir, radius=3),
            [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INTEGER")],
        ),
        "ann_lsh_topk": pyref.values_sql(
            pyref.ann_lsh_topk_rows(sf_dir, k=10, num_planes=6, num_tables=6),
            [("qid", "BIGINT"), ("vec_id", "BIGINT"), ("cosine", "DOUBLE"), ("rank", "INTEGER")],
        ),
        "emb_near_dup_lsh": pyref.values_sql(
            pyref.emb_near_dup_lsh_rows(sf_dir, threshold=0.3, num_planes=8),
            [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("cosine", "DOUBLE")],
        ),
        "media_features": pyref.values_sql(
            pyref.media_features_rows(200),
            [("media_id", "BIGINT"), ("kind", "VARCHAR"), ("n_bytes", "BIGINT"),
             ("checksum", "BIGINT"), ("fake_mean", "DOUBLE")],
        ),
        "media_frames": pyref.values_sql(
            pyref.media_frames_rows(120, every_ms=1000),
            [("media_id", "BIGINT"), ("frame_idx", "INTEGER"), ("frame_hex", "VARCHAR")],
        ),
        "media_decode_features": pyref.values_sql(
            pyref.media_decoded_rows(120),
            [("media_id", "BIGINT"), ("kind", "VARCHAR"), ("width", "INTEGER"),
             ("height", "INTEGER"), ("n_frames", "INTEGER"), ("n_samples", "INTEGER"),
             ("sample_rate", "INTEGER"), ("duration_ms", "INTEGER"),
             ("mean_luma", "DOUBLE"), ("rms", "DOUBLE"), ("peak", "INTEGER"),
             ("zcr", "DOUBLE"), ("thumb_checksum", "BIGINT")],
        ),
        "media_video_frames": pyref.values_sql(
            pyref.media_video_frame_rows(120),
            [("media_id", "BIGINT"), ("frame_idx", "INTEGER"),
             ("frame_luma", "DOUBLE"), ("thumb_checksum", "BIGINT")],
        ),
        "dedup_minhash_keep": pyref.values_sql(
            pyref.minhash_keep_rows(sf_dir, k_shingle=3, num_hashes=32, bands=8, threshold=0.5),
            [("doc_id", "BIGINT")],
        ),
        "ann_ivf_topk": pyref.values_sql(
            pyref.ivf_topk_rows(sf_dir, k=10, n_centroids=16, n_probe=4),
            [("qid", "BIGINT"), ("vec_id", "BIGINT"), ("cosine", "DOUBLE"), ("rank", "INTEGER")],
        ),
        "shard_tail_read": f"""
            SELECT op, count(*) AS n_rows, sum(lsn) AS sum_lsn,
                   count(DISTINCT url) AS n_urls
            FROM read_parquet('{_shard_tail_fixture()}/shard=*/f*.parquet')
            GROUP BY op
        """,
        "doc_repetition": """
            WITH d AS (
              SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
              FROM documents
            ),
            b AS (
              SELECT doc_id, ws, len(ws) AS n_words,
                     CASE WHEN len(ws) >= 2
                          THEN list_transform(range(len(ws) - 1), i -> ws[i+1] || ' ' || ws[i+2])
                          ELSE [] END AS bgs
              FROM d WHERE len(ws) > 0
            ),
            wc AS (SELECT doc_id, unnest(ws) AS g FROM b),
            wagg AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot
                     FROM (SELECT doc_id, g, count(*) c FROM wc GROUP BY 1, 2) GROUP BY 1),
            bc AS (SELECT doc_id, unnest(bgs) AS g FROM b),
            bagg AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot
                     FROM (SELECT doc_id, g, count(*) c FROM bc GROUP BY 1, 2) GROUP BY 1)
            SELECT b.doc_id, CAST(b.n_words AS INTEGER) AS n_words,
                   round(CAST(len(list_distinct(b.ws)) AS DOUBLE) / b.n_words, 6) AS distinct_ratio,
                   round(CAST(wagg.mx AS DOUBLE) / wagg.tot, 6) AS top_word_ratio,
                   round(CAST(bagg.mx AS DOUBLE) / bagg.tot, 6) AS top_bigram_ratio
            FROM b JOIN wagg USING (doc_id) LEFT JOIN bagg USING (doc_id)
        """,
        "url_canonicalize": pyref.values_sql(
            pyref.url_canon_rows(200),
            [("canon", "VARCHAR"), ("n_urls", "BIGINT"), ("min_id", "BIGINT")],
        ),
        "doc_unigram_logprob": """
            WITH w AS (
              SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS _w
              FROM documents
            ),
            vocab AS (SELECT _w, count(*) AS c FROM w GROUP BY 1),
            tot AS (SELECT sum(c) + count(*) AS denom FROM vocab),
            lp AS (SELECT _w, CAST(ln((c + 1) / (SELECT CAST(denom AS DOUBLE) FROM tot)) AS DECIMAL(20,12)) AS _lp
                   FROM vocab)
            SELECT doc_id, count(*) AS n_words,
                   round(CAST(sum(_lp) AS DOUBLE) / count(*), 6) AS avg_logprob
            FROM w JOIN lp USING (_w)
            GROUP BY doc_id
        """,
        "doc_decontaminate": r"""
            WITH words AS (
              SELECT doc_id, string_split_regex(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS w
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id, array_to_string(w[i:i+3], ' ') AS s
                FROM words, LATERAL unnest(generate_series(1, len(w) - 3)) AS t(i)
                WHERE len(w) >= 4
                UNION ALL
                SELECT doc_id, array_to_string(w, ' ') AS s FROM words WHERE len(w) < 4
              )
            ),
            ref AS (SELECT DISTINCT s FROM sh WHERE doc_id % 101 = 0)
            SELECT doc_id, count(DISTINCT s) AS n_matched_grams,
                   min(s) AS example_gram
            FROM sh JOIN ref USING (s)
            WHERE doc_id % 101 <> 0
            GROUP BY doc_id
        """,
        "doc_stratified_sample": pyref.values_sql(
            pyref.stratified_sample_rows(
                sf_dir, "documents", "text", "lang",
                {"en": 0.3, "de": 0.8}, default_fraction=1.0),
            [("lang", "VARCHAR"), ("n_rows", "BIGINT"), ("sum_ids", "BIGINT")],
        ),
        "doc_hash_split": pyref.values_sql(
            pyref.hash_split_rows(sf_dir, "documents", "text",
                                  [("train", 0.8), ("val", 0.1), ("test", 0.1)]),
            [("split", "VARCHAR"), ("n_rows", "BIGINT"), ("sum_chars", "BIGINT")],
        ),
        "sketch_kmv_distinct": pyref.values_sql(
            pyref.kmv_rows(sf_dir, "documents", "text", 128),
            [("k", "INTEGER"), ("n_kept", "INTEGER"),
             ("kth_hash", "BIGINT"), ("est_distinct", "DOUBLE")],
        ),
        "ann_pq_topk": pyref.values_sql(
            pyref.pq_topk_rows(sf_dir, k=10, m=8, n_codes=16),
            [("qid", "BIGINT"), ("vec_id", "BIGINT"),
             ("adc_dist", "DOUBLE"), ("rank", "INTEGER")],
        ),
        "ann_pq_recall": pyref.values_sql(
            pyref.pq_recall_rows(sf_dir, k=10, m=8, n_codes=16),
            [("n_queries", "INTEGER"), ("recall", "DOUBLE")],
        ),
        "ann_recall": pyref.values_sql(
            pyref.ann_recall_rows(sf_dir, k=10, num_planes=6, num_tables=6),
            [("n_queries", "INTEGER"), ("recall", "DOUBLE")],
        ),
    }


if __name__ == "__main__":
    from datax_spark.session import get_spark

    s = get_spark()
    df = entry(s)
    print("entry rows:", df.count())
    df.show(5)
