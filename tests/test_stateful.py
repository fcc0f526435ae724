"""applyInPandasWithState LWW advance filter: cross-batch state."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from datax_spark.cdc.generator import changes_df
from datax_spark.cdc.pipeline import CHANGE_SCHEMA
from datax_spark.cdc.stateful import lww_advance_filter


def test_batch_mode_keeps_only_advancing_events(spark):
    rows = [
        (1, "I", "k", "2024-01-01 00:01:00", None, "a"),
        (2, "U", "k", "2024-01-01 00:03:00", None, "b"),
        (3, "U", "k", "2024-01-01 00:02:00", None, "late"),   # stale -> dropped
        (4, "U", "j", "2024-01-01 00:01:00", None, "x"),
    ]
    df = spark.createDataFrame(
        rows, "lsn long, op string, url string, warc_ts string, html binary, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = lww_advance_filter(df).collect()
    got = sorted((r["url"], r["lsn"]) for r in out)
    assert got == [("j", 4), ("k", 1), ("k", 2)]


def test_streaming_state_survives_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    ch = changes_df(spark, 4000, n_keys=600, partitions=4).cache()
    # two files = two micro-batches with maxFilesPerTrigger=1
    for i in range(2):
        stg = str(tmp_path / f"stg{i}")
        ch.filter((F.col("lsn") > i * 2000) & (F.col("lsn") <= (i + 1) * 2000)) \
            .coalesce(1).write.parquet(stg)
        shutil.move(glob.glob(f"{stg}/part-*.parquet")[0], f"{src}/f{i}.parquet")

    stream = spark.readStream.schema(CHANGE_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    filtered = lww_advance_filter(stream)
    q = (
        filtered.writeStream.format("memory").queryName("advancing")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    out = spark.sql("SELECT * FROM advancing")
    # every key's surviving events are strictly increasing in (ts, lsn)
    from pyspark.sql import Window as W

    w = W.partitionBy("url").orderBy("warc_ts", "lsn")
    lagged = out.withColumn("pts", F.lag("warc_ts").over(w)).withColumn("pl", F.lag("lsn").over(w))
    violations = lagged.filter(
        F.col("pts").isNotNull()
        & ((F.col("warc_ts") < F.col("pts"))
           | ((F.col("warc_ts") == F.col("pts")) & (F.col("lsn") <= F.col("pl"))))
    ).count()
    assert violations == 0
    # the final (max) event per key always survives; batch-2 stale events
    # for keys advanced in batch 1 are dropped by checkpointed state
    ch.createOrReplaceTempView("raw")
    finals = spark.sql(
        "SELECT url, max_by(lsn, struct(warc_ts, lsn)) lsn FROM raw GROUP BY url"
    )
    missing = finals.join(out.select("url", "lsn"), ["url", "lsn"], "left_anti").count()
    assert missing == 0
    assert out.count() < ch.count()  # some events were actually filtered


def test_streaming_with_state_ttl(spark, tmp_path):
    """Bounded-state variant: same correctness property with a TTL set
    (expiry only relaxes the filter; per-key outputs stay strictly
    increasing within the run)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ch = changes_df(spark, 2000, n_keys=300, partitions=4).cache()
    for i in range(2):
        stg = str(tmp_path / f"stg{i}")
        ch.filter((F.col("lsn") > i * 1000) & (F.col("lsn") <= (i + 1) * 1000)) \
            .coalesce(1).write.parquet(stg)
        shutil.move(glob.glob(f"{stg}/part-*.parquet")[0], f"{src}/f{i}.parquet")

    stream = spark.readStream.schema(CHANGE_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    filtered = lww_advance_filter(stream, state_ttl_ms=60_000)
    q = (
        filtered.writeStream.format("memory").queryName("advancing_ttl")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    out = spark.sql("SELECT * FROM advancing_ttl")
    from pyspark.sql import Window as W

    w = W.partitionBy("url").orderBy("warc_ts", "lsn")
    lagged = out.withColumn("pts", F.lag("warc_ts").over(w)).withColumn("pl", F.lag("lsn").over(w))
    violations = lagged.filter(
        F.col("pts").isNotNull()
        & ((F.col("warc_ts") < F.col("pts"))
           | ((F.col("warc_ts") == F.col("pts")) & (F.col("lsn") <= F.col("pl"))))
    ).count()
    assert violations == 0
    assert out.count() >= 300  # at least every key's first event
