"""Dirty-record quarantine + ErrorRecordChecker threshold semantics."""

import pytest
from pyspark.sql import functions as F

from datax_spark.quarantine import ErrorLimitExceeded, ErrorLimits, split_dirty


def _batch(spark):
    rows = [
        (1, "I", "k1"),
        (2, "X", "k2"),      # invalid op
        (3, "U", None),      # null key
        (None, "D", "k3"),   # null lsn
        (5, "U", "k4"),
    ]
    return spark.createDataFrame(rows, "lsn long, op string, url string")


def test_split_dirty_routes_and_reasons(spark, tmp_path):
    qdir = str(tmp_path / "dead")
    clean, dirty = split_dirty(_batch(spark), "url", "op", "lsn", quarantine_dir=qdir)
    assert dirty == 3
    assert sorted(r["url"] or "" for r in clean.collect()) == ["k1", "k4"]
    dead = spark.read.parquet(qdir)
    assert sorted(r["_dirty_reason"] for r in dead.collect()) == [
        "invalid op", "null key", "null lsn",
    ]


def test_record_limit_takes_precedence(spark):
    limits = ErrorLimits(record=2, percentage=0.99)
    with pytest.raises(ErrorLimitExceeded, match="errorLimit.record"):
        split_dirty(_batch(spark), "url", "op", "lsn", limits=limits)


def test_percentage_limit(spark):
    limits = ErrorLimits(record=None, percentage=0.2)
    with pytest.raises(ErrorLimitExceeded, match="percentage"):
        split_dirty(_batch(spark), "url", "op", "lsn", limits=limits)
    # generous limits pass
    clean, dirty = split_dirty(_batch(spark), "url", "op", "lsn",
                               limits=ErrorLimits(record=10, percentage=0.9))
    assert dirty == 3 and clean.count() == 2


def test_replay_quarantine_repairs_and_rearms(spark, tmp_path):
    """Dead-letter replay: a fix cures SOME rows (they land in the lake
    through the normal fenced merge), uncured rows are re-quarantined,
    consumed files are archived — the repair loop is re-runnable."""
    import datetime as dt
    import glob
    import os

    from pyspark.sql import types as T

    from datax_spark.cdc.apply import apply_changes
    from datax_spark.lake.merge import bulk_load
    from datax_spark.lake.table import LakeTable
    from datax_spark.quarantine import replay_quarantine

    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
    ])
    root, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    t = LakeTable.create(spark, root, schema, key_col="url", num_buckets=2)
    ts = dt.datetime(2024, 1, 1)
    ok = spark.createDataFrame(
        [("https://x/1", ts, "en", 1, "I")],
        "url string, warc_ts timestamp, lang string, lsn long, op string")
    bad_schema = T.StructType([
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("op", T.StringType(), True),
    ])
    bad = spark.createDataFrame(
        [("https://x/2", ts, "fr", 2, "UPSERT"),   # curable: op alias
         (None, ts, "de", 3, "U")],                # incurable: null key
        bad_schema)
    apply_changes(t, ok.unionByName(bad), batch_id=0, quarantine_dir=qdir)
    assert t.read().count() == 1
    assert spark.read.parquet(qdir).count() == 2

    def fix(df):
        return df.withColumn(
            "op", F.when(F.col("op") == "UPSERT", F.lit("U")).otherwise(F.col("op")))

    m = replay_quarantine(spark, qdir, t.load(), fix, batch_id=1)
    assert m is not None and not m.get("skipped")
    live = {r["url"]: r["lang"] for r in t.read().collect()}
    assert live == {"https://x/1": "en", "https://x/2": "fr"}

    # incurable row re-quarantined as a live file; consumed ones archived
    live_files = glob.glob(os.path.join(qdir, "*.parquet"))
    assert live_files and spark.read.parquet(*live_files).count() == 1
    assert glob.glob(os.path.join(qdir, "_replayed-1", "*.parquet"))

    # second replay with a no-op fix: nothing cured, loop still safe
    m2 = replay_quarantine(spark, qdir, t.load(), lambda d: d, batch_id=2)
    assert m2 is not None
    assert t.read().count() == 2
    assert spark.read.parquet(*glob.glob(os.path.join(qdir, "*.parquet"))).count() == 1
