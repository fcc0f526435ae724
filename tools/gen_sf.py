"""Deterministic sf-scalable fixture generator.

Reproduces the /root/testdata schema (TPC-H-ish star + events +
documents + embeddings, one parquet FILE per table) at any scale
factor, so the oracle protocol and bench can run ABOVE the driver's
largest fixture (sf0.1) — VERDICT r4 "Next round #1": stop
plan-auditing the 100x claims, measure at 10x.

Faithful to the sf0.1 profile (measured, tools/README-level notes):
- events: 10 events/user, 5 equal event_types, ts monotone in
  event_id over 30 days (the per-key monotonicity several CDC oracles
  rely on), value ~ Exp(mean 50) (sf0.1: median 34.7 / q99 228 /
  max 560), props = '{"k": N}'.
- documents: 10..100 words from the same 31-word vocabulary, lang
  mix en 40% / {es,de,fr,zh} 15% each, source src0..19, ~5% of docs
  EXACT copies of a nearby earlier doc (keeps the dedup operators
  non-trivial at every scale).
- embeddings: 64-dim float, 10 label clusters (center ±0.2 per dim,
  noise ±0.1 — same ±0.3 component envelope as sf0.1), ~2% near-copies
  of the previous vector (keeps emb near-dup non-trivial).
- TPC-H tables: same key ranges x10, same categorical vocabularies
  (brands, types, segments, priorities, flags), same value envelopes
  (acctbal -1000..10000, quantity 1..50, extendedprice ..105k,
  discount 0..0.10, tax 0..0.08, orderdate 1995..2001-08,
  shipdate = orderdate + 1..95 days, 1..7 lines/order avg 4).

Everything derives from xxhash64(id, salt) — no RNG anywhere, so any
two runs (any partitioning, any Spark version with stable xxhash64)
produce byte-identical tables. The correctness protocol compares Spark
vs DuckDB ON THE SAME FILES, so distribution fidelity is about workload
realism (skew, cardinalities, join fan-outs), not about matching the
driver's exact bytes.

Usage: python tools/gen_sf.py --sf 1.0 --out /dev/shm/datax_sf1
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["LARGE", "STANDARD", "SMALL", "ECONOMY", "MEDIUM", "PROMO"]
SEGMENTS = ["AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "MACHINERY", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
LANG_SLOTS = ["en"] * 8 + ["es"] * 3 + ["de"] * 3 + ["fr"] * 3 + ["zh"] * 3
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _h(col, salt: str, mod: int):
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(mod))


def _pick(col, salt: str, values: list[str]):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(col, salt, len(values)) + 1).cast("int"))


def _write_one(df, out_dir: str, name: str) -> None:
    stg = os.path.join(out_dir, f"_stg_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stg)
    part = glob.glob(os.path.join(stg, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(out_dir, f"{name}.parquet"))
    shutil.rmtree(stg, ignore_errors=True)
    print(f"  {name}.parquet")


def generate(spark, sf: float, out_dir: str, cpus: int = 32) -> None:
    m = sf / 0.1  # row multiplier relative to the sf0.1 base profile
    n_events = int(100_000 * m)
    n_users = int(1_500 * m)
    n_docs = int(5_000 * m)
    n_vecs = int(2_000 * m)
    n_cust = int(15_000 * m)
    n_supp = int(1_000 * m)
    n_part = int(20_000 * m)
    n_ord = int(150_000 * m)
    os.makedirs(out_dir, exist_ok=True)

    # ---- region / nation (fixed small dims)
    _write_one(
        spark.createDataFrame(
            list(enumerate(REGIONS)), "r_regionkey int, r_name string"),
        out_dir, "region")
    _write_one(
        spark.createDataFrame(
            [(i, f"NATION_{i}", i % 5) for i in range(25)],
            "n_nationkey int, n_name string, n_regionkey int"),
        out_dir, "nation")

    # ---- events: ts monotone in event_id (per-key monotone follows)
    step_us = int(30 * 86400 * 1e6 / max(n_events, 1))
    u = (_h(F.col("id"), "ev_u", 1_000_000) + 1) / 1_000_001.0
    ev = spark.range(0, n_events, 1, cpus).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                              (F.col("id") * step_us
                               + _h(F.col("id"), "ev_j", max(step_us, 1)))
                              / F.lit(1e6))).alias("ts"),
        _h(F.col("id"), "ev_user", n_users).alias("user_id"),
        _pick(F.col("id"), "ev_type", EVENT_TYPES).alias("event_type"),
        F.round(-F.log(u) * 50.0, 2).alias("value"),
        F.concat(F.lit('{"k": '),
                 _h(F.col("id"), "ev_k", 100).cast("string"),
                 F.lit("}")).alias("props"),
    )
    _write_one(ev, out_dir, "events")

    # ---- documents (~5% exact near-window copies keep dedup non-trivial)
    is_dup = (_h(F.col("id"), "doc_dup", 20) == 0) & (F.col("id") >= 50)
    base = F.when(is_dup, F.col("id") - (_h(F.col("id"), "doc_base", 49) + 1)) \
        .otherwise(F.col("id"))
    n_words = (_h(base, "doc_len", 91) + 10).cast("int")
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda j: F.element_at(
                vocab_arr, (F.pmod(F.xxhash64(base, F.lit("doc_w"), j),
                                   F.lit(len(VOCAB))) + 1).cast("int")),
        ), " ")
    docs = spark.range(0, n_docs, 1, cpus).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        _pick(base, "doc_lang", LANG_SLOTS).alias("lang"),
        F.concat(F.lit("src"), _h(base, "doc_src", 20).cast("string")).alias("source"),
        F.length(text).alias("n_chars"),
    )
    _write_one(docs, out_dir, "documents")

    # ---- embeddings: 10 clusters, ~2% near-copies of the previous vector
    dim = 64
    is_near = (_h(F.col("id"), "emb_dup", 50) == 0) & (F.col("id") >= 1)
    ebase = F.when(is_near, F.col("id") - 1).otherwise(F.col("id"))
    label = _h(ebase, "emb_label", 10)
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            (F.pmod(F.xxhash64(label, F.lit("emb_c"), d), F.lit(401)) - 200) / 1000.0
            + (F.pmod(F.xxhash64(ebase, F.lit("emb_n"), d), F.lit(201)) - 100) / 1000.0
            + F.when(is_near,
                     (F.pmod(F.xxhash64(F.col("id"), F.lit("emb_e"), d),
                             F.lit(11)) - 5) / 1000.0).otherwise(F.lit(0.0))
        ),
    ).cast("array<float>")
    emb = spark.range(0, n_vecs, 1, cpus).select(
        F.col("id").alias("vec_id"),
        comp.alias("embedding"),
        label.cast("int").alias("label"),
    )
    _write_one(emb, out_dir, "embeddings")

    # ---- customer / supplier / part
    cust = spark.range(0, n_cust, 1, cpus).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        _h(F.col("id"), "c_nat", 25).cast("int").alias("c_nationkey"),
        F.round(_h(F.col("id"), "c_bal", 1_100_000) / 100.0 - 1000.0, 2).alias("c_acctbal"),
        _pick(F.col("id"), "c_seg", SEGMENTS).alias("c_mktsegment"),
    )
    _write_one(cust, out_dir, "customer")
    supp = spark.range(0, n_supp, 1, cpus).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        _h(F.col("id"), "s_nat", 25).cast("int").alias("s_nationkey"),
        F.round(_h(F.col("id"), "s_bal", 1_000_000) / 100.0, 2).alias("s_acctbal"),
    )
    _write_one(supp, out_dir, "supplier")
    part = spark.range(0, n_part, 1, cpus).select(
        F.col("id").alias("p_partkey"),
        F.concat(_pick(F.col("id"), "p_adj", ADJS), F.lit(" "),
                 _pick(F.col("id"), "p_noun", NOUNS)).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 (_h(F.col("id"), "p_brand", 25) + 1).cast("string")).alias("p_brand"),
        _pick(F.col("id"), "p_type", TYPES).alias("p_type"),
        (_h(F.col("id"), "p_size", 50) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.pmod(F.col("id"), F.lit(2000)) / 10.0, 2).alias("p_retailprice"),
    )
    _write_one(part, out_dir, "part")

    # ---- orders / lineitem (1..7 lines per order, avg 4)
    odate = (F.lit("1995-01-01").cast("timestamp")
             + F.make_dt_interval(_h(F.col("o_orderkey"), "o_date", 2404)))
    orders = spark.range(0, n_ord, 1, cpus).select(
        F.col("id").alias("o_orderkey"),
        _h(F.col("id"), "o_cust", n_cust).alias("o_custkey"),
        _pick(F.col("id"), "o_status", ["O", "P", "F"]).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + _h(F.col("id"), "o_total", 49_900_000) / 100.0, 2).alias("o_totalprice"),
        _pick(F.col("id"), "o_prio", PRIORITIES).alias("o_orderpriority"),
    ).withColumn("o_orderdate", odate).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    _write_one(orders, out_dir, "orders")

    ln = F.col("l_linenumber")
    li = (
        spark.read.parquet(os.path.join(out_dir, "orders.parquet"))
        .repartition(cpus)
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_orderdate").alias("_od"),
            F.explode(
                F.sequence(F.lit(1),
                           (_h(F.col("o_orderkey"), "l_n", 7) + 1).cast("int"))
            ).alias("l_linenumber"),
        )
        .select(
            "l_orderkey",
            F.pmod(F.xxhash64("l_orderkey", ln, F.lit("l_part")), F.lit(n_part)).alias("l_partkey"),
            F.pmod(F.xxhash64("l_orderkey", ln, F.lit("l_supp")), F.lit(n_supp)).alias("l_suppkey"),
            ln,
            (F.pmod(F.xxhash64("l_orderkey", ln, F.lit("l_qty")), F.lit(50)) + 1)
            .cast("double").alias("l_quantity"),
            F.round(F.lit(900.0)
                    + F.pmod(F.xxhash64("l_orderkey", ln, F.lit("l_ext")),
                             F.lit(10_410_000)) / 100.0, 2).alias("l_extendedprice"),
            (F.pmod(F.xxhash64("l_orderkey", ln, F.lit("l_disc")), F.lit(11)) / 100.0)
            .alias("l_discount"),
            (F.pmod(F.xxhash64("l_orderkey", ln, F.lit("l_tax")), F.lit(9)) / 100.0)
            .alias("l_tax"),
            F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                         (F.pmod(F.xxhash64("l_orderkey", ln, F.lit("l_rf")), F.lit(3)) + 1)
                         .cast("int")).alias("l_returnflag"),
            F.element_at(F.array(F.lit("O"), F.lit("F")),
                         (F.pmod(F.xxhash64("l_orderkey", ln, F.lit("l_ls")), F.lit(2)) + 1)
                         .cast("int")).alias("l_linestatus"),
            (F.col("_od") + F.make_dt_interval(
                F.pmod(F.xxhash64("l_orderkey", ln, F.lit("l_ship")), F.lit(95)) + 1))
            .alias("l_shipdate"),
        )
    )
    _write_one(li, out_dir, "lineitem")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/dev/shm/datax_sf1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    from datax_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]")
    generate(spark, args.sf, args.out, args.cpus)
    for t in sorted(os.listdir(args.out)):
        p = os.path.join(args.out, t)
        print(f"{os.path.getsize(p)/1e6:8.1f} MB  {t}")


if __name__ == "__main__":
    main()
