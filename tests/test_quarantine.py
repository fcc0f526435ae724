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
