"""Anti-entropy table diff + repair (lake/diff.py): signature pass finds
diverged virtual buckets, row work confined to them, repair converges
the mirror byte-for-byte."""

import datetime as dt

from pyspark.sql import functions as F

from datax_spark.lake.diff import bucket_signatures, repair, table_diff
from datax_spark.lake.merge import bulk_load, merge_into
from datax_spark.lake.table import LakeTable
from tests.test_lake import SCHEMA, _pages


def _mk_pair(spark, tmp_path, nb_a=4, nb_b=8):
    """Source and mirror with DIFFERENT physical layouts, same content."""
    a = LakeTable.create(spark, str(tmp_path / "a"), SCHEMA, key_col="url",
                         num_buckets=nb_a)
    b = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, key_col="url",
                         num_buckets=nb_b)
    bulk_load(a, _pages(spark, 300))
    bulk_load(b, _pages(spark, 300))
    return a, b


def test_identical_tables_zero_divergence(spark, tmp_path):
    a, b = _mk_pair(spark, tmp_path)
    d = table_diff(a, b)
    assert d["diverged_vbuckets"] == []
    assert d["only_in_a"].count() == 0 and d["only_in_b"].count() == 0


def test_diff_pinpoints_and_repair_converges(spark, tmp_path):
    a, b = _mk_pair(spark, tmp_path)
    # corrupt the mirror: drift one value (with a LATER ts — the case a
    # naive upsert repair would lose), drop one key, add one phantom key
    late = dt.datetime(2099, 1, 1)
    merge_into(b.load(), spark.createDataFrame(
        [("https://x/7", late, "CORRUPT", 9001, "U"),
         ("https://x/8", late, None, 9002, "D"),
         ("https://x/phantom", late, "ghost", 9003, "I")],
        "url string, warc_ts timestamp, lang string, lsn long, op string"),
        batch_id=77, merge_mode="mor")
    b = b.load()

    d = table_diff(a, b)
    assert 1 <= len(d["diverged_vbuckets"]) <= 3
    only_a = {r["url"] for r in d["only_in_a"].collect()}
    only_b = {r["url"] for r in d["only_in_b"].collect()}
    assert only_a == {"https://x/7", "https://x/8"}
    assert only_b == {"https://x/7", "https://x/phantom"}

    # signature pass is cheap: 4096-row-bounded aggregate
    assert bucket_signatures(a).count() <= 4096

    snap = repair(b, d, ts_col="warc_ts", batch_id=78)
    assert snap is not None
    b = b.load()
    ra, rb = a.read(), b.read()
    assert ra.exceptAll(rb.select(*ra.columns)).count() == 0
    assert rb.exceptAll(ra.select(*rb.columns)).count() == 0
    d2 = table_diff(a, b)
    assert d2["diverged_vbuckets"] == []

    # empty-diff repair is a no-op
    assert repair(b.load(), d2, ts_col="warc_ts", batch_id=79) is None


def test_diff_schema_mismatch_raises(spark):
    import pytest

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "x", 2)], "k long, v string, extra long")
    with pytest.raises(ValueError, match="column sets differ"):
        table_diff(a, b, key_col="k")
