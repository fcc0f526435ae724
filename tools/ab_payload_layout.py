"""Interleaved A/B: columnar-shuffle-friendly payload layout on the
bulk-replay collapse (VERDICT r4 "Next round #8" — the remaining
documented efficiency lever is bytes-through-exchange).

Arms, identical winners by construction (verified before timing):

- **A (current)**: the production layout — repartition(bucket) →
  max(struct(warc_ts, lsn, payload...)) per key (the cow_union_plan
  collapse shape).
- **B (packed)**: pre-exchange projection packs the LWW order key
  ``(warc_ts, lsn)`` into ONE int64 — ``epoch_sec(warc_ts) * 2^32 +
  lsn`` (order-isomorphic while ts is second-granular and lsn < 2^32;
  both hold for the replay feed: generator.py builds warc_ts with
  timestamp_seconds and bench lsns top out at ~32M) — and
  dictionary-encodes ``lang`` to a TINYINT against a broadcast of the
  5-value domain. After the collapse the winner unpacks back to
  (warc_ts, lsn, lang). Exchange row shrinks by ~10 bytes + null
  bitmap slots; html (~2.8 KB/row) still dominates, so the expected
  effect is ~0.4% of exchange bytes — this experiment exists to
  MEASURE that expectation, not to assume it.

Protocol: same as the latemat/zstd A/Bs — one warmup, then arms
interleaved rep by rep, min per arm, noop sink (isolates compute +
exchange from table-commit I/O). Default changes only on a win.

Run: python tools/ab_payload_layout.py [n_events] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

LANGS_DOMAIN = 64  # > any real lang cardinality in the feed


def _collapse_current(ch, num_buckets: int):
    from datax_spark.lake.table import bucket_expr

    payload = [c for c in ch.columns if c != "url"]
    ordered = ["warc_ts", "lsn"] + [c for c in payload if c not in ("warc_ts", "lsn")]
    b = ch.withColumn("_b", bucket_expr("url", num_buckets))
    return (
        b.repartition(num_buckets * 4, "_b")
        .groupBy("_b", "url")
        .agg(F.max(F.struct(*[F.col(c) for c in ordered])).alias("_w"))
        .select("url", *[F.col(f"_w.{c}").alias(c) for c in ordered])
    )


def _collapse_packed(ch, num_buckets: int):
    from datax_spark.lake.table import bucket_expr

    langs = [r["lang"] for r in ch.select("lang").distinct().collect() if r["lang"]]
    lang_arr = F.array(*[F.lit(x) for x in sorted(langs)])
    lang_id = F.coalesce(F.array_position(lang_arr, F.col("lang")), F.lit(0)).cast("smallint")
    packed = ch.select(
        "url",
        (F.unix_timestamp("warc_ts") * F.lit(1 << 32).cast("long") + F.col("lsn")).alias("_tslsn"),
        lang_id.alias("_lang_id"),
        *[c for c in ch.columns if c not in ("url", "warc_ts", "lsn", "lang")],
    ).withColumn("_b", bucket_expr("url", num_buckets))
    payload = [c for c in packed.columns if c not in ("url", "_b")]
    ordered = ["_tslsn"] + [c for c in payload if c != "_tslsn"]
    out = (
        packed.repartition(num_buckets * 4, "_b")
        .groupBy("_b", "url")
        .agg(F.max(F.struct(*[F.col(c) for c in ordered])).alias("_w"))
        .select("url", *[F.col(f"_w.{c}").alias(c) for c in ordered])
    )
    return out.select(
        "url",
        # decode with integer bit ops: `/` is DOUBLE division in Spark SQL
        # and timestamp_seconds(double) keeps the fractional part
        F.timestamp_seconds(F.shiftright(F.col("_tslsn"), 32)).alias("warc_ts"),
        F.col("_tslsn").bitwiseAND(F.lit((1 << 32) - 1)).alias("lsn"),
        F.when(F.col("_lang_id") > 0,
               F.element_at(lang_arr, F.col("_lang_id").cast("int"))).alias("lang"),
        *[c for c in out.columns if c not in ("url", "_tslsn", "_lang_id")],
    )


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from datax_spark.cdc.generator import changes_df
    from datax_spark.session import get_spark

    os.makedirs("/dev/shm/datax_ab_local", exist_ok=True)
    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=cpus * 4,
        extra_conf={
            "spark.local.dir": "/dev/shm/datax_ab_local",
            "spark.driver.memory": "24g",
            "spark.driver.extraJavaOptions": "-Xms24g -XX:+AlwaysPreTouch",
        })
    src = "/dev/shm/datax_ab_payload_changes"
    changes_df(spark, n_events, n_keys=max(1000, n_events // 4),
               partitions=cpus, html_paragraphs=20) \
        .write.mode("overwrite").parquet(src)
    ch = spark.read.parquet(src)

    # equivalence gate: identical winner rows before any timing
    a = _collapse_current(ch, 64)
    bb = _collapse_packed(ch, 64).select(*a.columns)
    mism = a.exceptAll(bb).count() + bb.exceptAll(a).count()
    assert mism == 0, f"arms disagree on {mism} rows — A/B void"
    print("equivalence OK", flush=True)

    for df in (a, bb):  # warm both plans
        df.write.format("noop").mode("overwrite").save()
    best: dict[str, float] = {}
    for rep in range(reps):
        for label, fn in (("current", _collapse_current), ("packed", _collapse_packed)):
            t0 = time.time()
            fn(ch, 64).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[label] = min(best.get(label, dt), dt)
            print(f"rep{rep} {label}: {dt:.2f}s", flush=True)
    out = {"n_events": n_events, "reps": reps,
           "collapse_current_sec": round(best["current"], 2),
           "collapse_packed_sec": round(best["packed"], 2),
           "packed_speedup": round(best["current"] / best["packed"], 3)}
    print(json.dumps(out))
    import shutil

    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree("/dev/shm/datax_ab_local", ignore_errors=True)


if __name__ == "__main__":
    main()
