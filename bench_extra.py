"""Round-6 optimization harness — NOT the driver bench (bench.py is
frozen for measurement). Three modes:

  python bench_extra.py queries q1 q2 ...   # min-of-2 noop-sink timing
  python bench_extra.py plans out_dir q1 .. # .explain("formatted") dumps
  python bench_extra.py replay [n_events]   # phase-split replay timing

The replay mode decomposes bench.py's headline CoW replay into its
phases (guide §1.1/§1.4): payload dedup exchange, Arrow enrichment,
union-collapse + write, so each optimization targets a measured number
rather than a guess. Same session confs as bench.py's 4N arm.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
HTML_PARAGRAPHS = 20


def _spark():
    from datax_spark.session import get_spark

    os.makedirs("/dev/shm/datax_bench_local", exist_ok=True)
    return get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 4,
        extra_conf={
            "spark.local.dir": "/dev/shm/datax_bench_local",
            "spark.driver.memory": "24g",
            "spark.driver.extraJavaOptions": (
                "-Xms24g -XX:+AlwaysPreTouch "
                "-XX:+UnlockDiagnosticVMOptions "
                "-XX:GCLockerRetryAllocationCount=64"
            ),
        },
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def mode_queries(names: list[str], reps: int = 2) -> None:
    import __spark_entry__ as entry_mod

    spark = _spark()
    qs = entry_mod.queries()
    out = {}
    for name in names:
        best = None
        for _ in range(reps):
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 2)
        print(f"{name:28s} {best:7.2f}s", flush=True)
    print("QUERIES " + json.dumps(out))


def mode_plans(out_dir: str, names: list[str]) -> None:
    import __spark_entry__ as entry_mod

    spark = _spark()
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name} plan ({len(plan)} chars)", flush=True)


def mode_replay(n_events: int) -> None:
    from pyspark.sql import functions as F, types as T

    from datax_spark.cdc.apply import apply_changes
    from datax_spark.cdc.generator import changes_df
    from datax_spark.functions.extract import with_enrichment
    from datax_spark.lake.merge import lww_dedup
    from datax_spark.lake.table import LakeTable

    spark = _spark()
    base = tempfile.mkdtemp(prefix="datax_bx_", dir="/dev/shm")
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("lang_id", T.StringType(), True),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("fp", T.LongType(), True),
    ])
    try:
        changes_df(spark, n_events, n_keys=max(1000, n_events // 4),
                   partitions=CPUS, html_paragraphs=HTML_PARAGRAPHS
                   ).write.parquet(f"{base}/changes")
        ch = spark.read.parquet(f"{base}/changes")
        sc = spark.sparkContext
        phases = {}

        def timed(label, fn, reps=2):
            best = None
            for _ in range(reps):
                sc.setJobDescription(label)
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            sc.setJobDescription(None)
            phases[label] = round(best, 2)
            print(f"{label:32s} {best:7.2f}s", flush=True)

        timed("scan_only", lambda: _noop(ch))
        timed("scan_narrow_stats", lambda: _noop(
            ch.select("url", F.col("warc_ts"), "lsn").groupBy("url").agg(
                F.max(F.struct("warc_ts", "lsn")))))
        timed("lww_dedup", lambda: _noop(lww_dedup(ch, "url", "warc_ts", "lsn")))
        timed("lww_dedup_enrich", lambda: _noop(
            with_enrichment(lww_dedup(ch, "url", "warc_ts", "lsn"))))

        def full(mode):
            root = f"{base}/t_{mode}_{time.time_ns()}"
            t = LakeTable.create(spark, root, schema, key_col="url",
                                 num_buckets=64)
            apply_changes(t, ch, batch_id=0, transform=with_enrichment,
                          merge_mode=mode)
            shutil.rmtree(root, ignore_errors=True)

        timed("apply_cow_full", lambda: full("cow"), reps=2)
        timed("apply_mor_full", lambda: full("mor"), reps=2)
        print("REPLAY_PHASES " + json.dumps(phases))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def mode_zone_ab() -> None:
    """VERDICT r5 #7: the zone-scan payoff as numbers — scan_zone vs
    read().filter over the same clustered table: files opened and wall,
    identical row counts."""
    import datetime

    from pyspark.sql import functions as F, types as T

    from datax_spark.lake.merge import bulk_load
    from datax_spark.lake.table import LakeTable

    spark = _spark()
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    schema = T.StructType([
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    base = tempfile.mkdtemp(prefix="datax_zab_", dir="/dev/shm")
    try:
        table = LakeTable.create(spark, f"{base}/t", schema,
                                 key_col="event_id", num_buckets=4)
        bulk_load(table, ev)
        table.cluster_by("ts", max_records_per_file=max(200, ev.count() // 32))
        lo, hi = datetime.datetime(2024, 1, 3), datetime.datetime(2024, 1, 8)
        kept, pruned = table.zone_prune_plan(lo, hi)
        out = {"files_total": len(kept) + len(pruned), "files_kept": len(kept),
               "skip_ratio": round(len(pruned) / (len(kept) + len(pruned)), 3)}
        cond = (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
        for label, mk in (("zone", lambda: table.scan_zone(lo, hi)),
                          ("full", lambda: table.read().filter(cond))):
            best = None
            for _ in range(3):
                t0 = time.time()
                n = mk().count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[f"{label}_wall_sec"] = round(best, 3)
            out[f"{label}_rows"] = n
            out[f"{label}_files_read"] = len(set(mk().inputFiles()))
        print("ZONE_AB " + json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def mode_scd2_hotkey(n_versions: int = 100_000, n_other: int = 100_000) -> None:
    """VERDICT r5 #9: does the SCD2 interval window die on per-key
    version skew? One key carries ``n_versions`` versions (a 10^5-deep
    window partition) next to ``n_other`` single-version keys."""
    from pyspark.sql import functions as F

    from datax_spark.cdc.scd2 import scd2_snapshot

    spark = _spark()
    hot = spark.range(n_versions).select(
        F.lit(0).alias("user_id"),
        F.lit("U").alias("op"),
        F.timestamp_seconds(F.col("id") + 1).alias("ts"),
        (F.col("id") + 1).alias("lsn"),
        F.lit("e").alias("event_type"),
        F.col("id").cast("double").alias("value"),
    )
    cold = spark.range(n_other).select(
        (F.col("id") + 1).alias("user_id"),
        F.lit("I").alias("op"),
        F.timestamp_seconds(F.lit(1)).alias("ts"),
        (F.col("id") + n_versions + 1).alias("lsn"),
        F.lit("e").alias("event_type"),
        F.col("id").cast("double").alias("value"),
    )
    ch = hot.unionByName(cold)
    best = None
    for _ in range(2):
        t0 = time.time()
        n = scd2_snapshot(ch, "user_id", ts_col="ts", lsn_col="lsn",
                          op_col="op").count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print("SCD2_HOTKEY " + json.dumps(
        {"hot_versions": n_versions, "cold_keys": n_other,
         "rows_out": n, "wall_sec": round(best, 2)}))


def mode_semdedup_scale() -> None:
    """VERDICT r5 #3 evidence: fixed k is quadratic in n, k ~ n/target
    (target_cluster_size) is ~linear — measured on synthetic unit-norm-
    free embeddings at 1x/4x/10x rows."""
    from pyspark.sql import functions as F

    from datax_spark.operators.clustering import semantic_dedup_pairs

    spark = _spark()
    dim, base_n = 64, 2000
    out = []
    for mult in (1, 4, 10):
        n = base_n * mult
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: (F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001))
                           - 1000.0) / 1000.0,
            ).alias("embedding"),
        ).repartition(CPUS).persist()
        emb.count()
        row = {"n": n}
        for label, kw in (("fixed_k8", dict(k=8)),
                          ("target250", dict(target_cluster_size=250))):
            t0 = time.time()
            semantic_dedup_pairs(emb, iters=3, threshold=0.99, **kw) \
                .write.format("noop").mode("overwrite").save()
            row[label + "_sec"] = round(time.time() - t0, 2)
        out.append(row)
        emb.unpersist()
        print("SEMDEDUP_SCALE " + json.dumps(row), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        mode_queries(sys.argv[2:])
    elif mode == "plans":
        mode_plans(sys.argv[2], sys.argv[3:])
    elif mode == "replay":
        mode_replay(int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000)
    elif mode == "zone_ab":
        mode_zone_ab()
    elif mode == "scd2_hotkey":
        mode_scd2_hotkey(*(int(a) for a in sys.argv[2:4]))
    elif mode == "semdedup_scale":
        mode_semdedup_scale()
    else:
        raise SystemExit(f"unknown mode {mode}")
