"""Table-to-table incremental sync (lake/feed.py): bootstrap, ticks,
crash-safety via the watermark fence, and convergence under deletes."""

import pytest
from pyspark.sql import functions as F

from datax_spark.cdc.apply import apply_changes
from datax_spark.cdc.generator import changes_df
from datax_spark.lake.feed import last_synced_snapshot, sync_incremental
from datax_spark.lake.table import LakeTable
from tests.test_merge import SCHEMA as _S


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture()
def pair(spark, tmp_path):
    src_root, dst_root = str(tmp_path / "src"), str(tmp_path / "dst")
    LakeTable.create(spark, src_root, _S, key_col="url", num_buckets=8)
    # different layout downstream on purpose — sync is layout-agnostic
    LakeTable.create(spark, dst_root, _S, key_col="url", num_buckets=4)
    ch = changes_df(spark, 6000, n_keys=700, partitions=4).cache()
    return src_root, dst_root, ch


def test_bootstrap_then_ticks_converge(spark, pair):
    src_root, dst_root, ch = pair
    src = LakeTable(spark, src_root).load()
    apply_changes(src, ch.filter("lsn <= 2000"), batch_id=0)

    # tick 1: bootstrap (dst empty)
    m1 = sync_incremental(LakeTable(spark, src_root).load(), LakeTable(spark, dst_root).load())
    assert not m1.get("skipped")
    _assert_same(LakeTable(spark, dst_root).load().read(),
                 LakeTable(spark, src_root).load().read())

    # more upstream batches (updates + deletes), then tick 2
    src = LakeTable(spark, src_root).load()
    apply_changes(src, ch.filter("lsn > 2000 AND lsn <= 4000"), batch_id=1)
    src = LakeTable(spark, src_root).load()
    apply_changes(src, ch.filter("lsn > 4000"), batch_id=2)
    m2 = sync_incremental(LakeTable(spark, src_root).load(), LakeTable(spark, dst_root).load())
    assert not m2.get("skipped")
    _assert_same(LakeTable(spark, dst_root).load().read(),
                 LakeTable(spark, src_root).load().read())

    # tick 3: nothing new → skipped, watermark at source head
    m3 = sync_incremental(LakeTable(spark, src_root).load(), LakeTable(spark, dst_root).load())
    assert m3.get("skipped")
    assert last_synced_snapshot(LakeTable(spark, dst_root).load()) == m2["src_snapshot"]


def test_repeated_tick_is_fenced_noop(spark, pair):
    """Racing/re-run ticks over the same feed window are LWW/fence
    no-ops — the crash-safety property."""
    src_root, dst_root, ch = pair
    src = LakeTable(spark, src_root).load()
    apply_changes(src, ch, batch_id=0)
    src = LakeTable(spark, src_root).load()
    sync_incremental(src, LakeTable(spark, dst_root).load())
    dst = LakeTable(spark, dst_root).load()
    snaps_before = len(dst.snapshots())
    # same upstream snapshot applied again through apply_changes directly
    # (simulates a tick that crashed after merge but re-ran)
    m = sync_incremental(src, LakeTable(spark, dst_root).load())
    assert m.get("skipped")
    assert len(LakeTable(spark, dst_root).load().snapshots()) == snaps_before
    _assert_same(LakeTable(spark, dst_root).load().read(), src.read())


def test_sync_carries_deletes(spark, pair):
    src_root, dst_root, ch = pair
    src = LakeTable(spark, src_root).load()
    apply_changes(src, ch.filter("lsn <= 3000"), batch_id=0)
    sync_incremental(LakeTable(spark, src_root).load(), LakeTable(spark, dst_root).load())
    src = LakeTable(spark, src_root).load()
    apply_changes(src, ch.filter("lsn > 3000"), batch_id=1)
    sync_incremental(LakeTable(spark, src_root).load(), LakeTable(spark, dst_root).load())

    ch.createOrReplaceTempView("_fs_ch")
    deleted = spark.sql(
        "SELECT url FROM (SELECT url, max_by(op, struct(warc_ts, lsn)) fop "
        "FROM _fs_ch GROUP BY url) WHERE fop = 'D'")
    assert deleted.count() > 0
    dst_read = LakeTable(spark, dst_root).load().read()
    assert dst_read.join(deleted, "url").count() == 0
    _assert_same(dst_read, LakeTable(spark, src_root).load().read())
