"""Bucket-count evolution (LakeTable.rebucket): content fidelity across
the layout change, tombstone/delta folding, pruning under the new
layout, and merges continuing against it."""

import pytest
from pyspark.sql import functions as F

from datax_spark.cdc.apply import apply_changes
from datax_spark.cdc.generator import changes_df
from datax_spark.lake.table import LakeTable, bucket_expr
from tests.test_merge import SCHEMA as _S  # reuse the merge suite's page schema


def _mk(spark, root, nb=8):
    return LakeTable.create(spark, root, _S, key_col="url", num_buckets=nb)


@pytest.fixture()
def seeded(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root)
    ch = changes_df(spark, 4000, n_keys=600, partitions=4)
    apply_changes(t, ch, batch_id=0)
    return spark, root, ch


def test_rebucket_preserves_content_and_prunes(seeded):
    spark, root, ch = seeded
    t = LakeTable(spark, root).load()
    before = t.read()
    before_rows = before.count()

    snap = t.rebucket(32)
    assert snap["summary"]["operation"] == "rebucket"
    assert snap["summary"]["num_buckets"] == 32
    assert snap["summary"]["previous_num_buckets"] == 8

    t2 = LakeTable(spark, root).load()
    assert t2.num_buckets == 32
    after = t2.read()
    assert after.count() == before_rows
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0

    # manifest bucket ids live in the new layout and agree with the
    # bucket function — pruned reads see exactly their keys
    buckets = {e["bucket"] for e in t2.manifest()}
    assert buckets <= set(range(32)) and max(buckets) >= 8
    some = sorted(buckets)[:3]
    pruned = t2.read(buckets=some)
    expect = after.filter(bucket_expr("url", 32).isin(some))
    assert pruned.exceptAll(expect).count() == 0
    assert expect.exceptAll(pruned).count() == 0


def test_merge_continues_after_rebucket(seeded):
    spark, root, ch = seeded
    t = LakeTable(spark, root).load()
    t.rebucket(16)
    t2 = LakeTable(spark, root).load()
    more = changes_df(spark, 6000, n_keys=600, partitions=4).filter(F.col("lsn") > 4000)
    apply_changes(t2, more, batch_id=1)

    # oracle over the FULL change history
    full = changes_df(spark, 6000, n_keys=600, partitions=4)
    full.createOrReplaceTempView("_rb_ch")
    expected = spark.sql(
        "SELECT url FROM (SELECT url, max_by(op, struct(warc_ts, lsn)) fop "
        "FROM _rb_ch GROUP BY url) WHERE fop <> 'D'")
    got = LakeTable(spark, root).load().read().select("url")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_rebucket_folds_mor_deltas_and_keeps_tombstones(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root)
    ch = changes_df(spark, 3000, n_keys=400, partitions=4)
    apply_changes(t, ch.filter("lsn <= 2000"), batch_id=0, merge_mode="cow")
    t = LakeTable(spark, root).load()
    apply_changes(t, ch.filter("lsn > 2000"), batch_id=1, merge_mode="mor")
    t = LakeTable(spark, root).load()
    assert any(e.get("kind") == "delta" for e in t.manifest())
    before = t.read()
    before_rows = before.count()

    t.rebucket(24)
    t2 = LakeTable(spark, root).load()
    # deltas folded: rebucket is also a full compaction
    assert all(e.get("kind") != "delta" for e in t2.manifest())
    after = t2.read()
    assert after.count() == before_rows
    assert after.exceptAll(before).count() == 0

    # deleted keys stayed deleted across the layout change
    ch.createOrReplaceTempView("_rbm_ch")
    deleted = spark.sql(
        "SELECT url FROM (SELECT url, max_by(op, struct(warc_ts, lsn)) fop "
        "FROM _rbm_ch GROUP BY url) WHERE fop = 'D'")
    assert after.select("url").join(deleted, "url").count() == 0


def test_rebucket_noop_and_validation(seeded):
    spark, root, _ = seeded
    t = LakeTable(spark, root).load()
    assert t.rebucket(8) is None  # same layout: no commit
    with pytest.raises(ValueError, match=">= 1"):
        t.rebucket(0)


def test_snapshot_summaries_record_layout(seeded):
    spark, root, _ = seeded
    t = LakeTable(spark, root).load()
    t.rebucket(32)
    t2 = LakeTable(spark, root).load()
    snaps = t2.snapshots()
    # pre-rebucket snapshot says 8, rebucket snapshot says 32
    assert snaps[-2]["summary"]["num_buckets"] == 8
    assert snaps[-1]["summary"]["num_buckets"] == 32


def test_max_records_per_file_splits_buckets(spark, tmp_path):
    """Buckets that outgrow one file split on write; reads, LWW merges,
    and compaction are unaffected (manifest is many-files-per-bucket)."""
    root = str(tmp_path / "tsplit")
    t = LakeTable.create(spark, root, _S, key_col="url", num_buckets=4)
    ch = changes_df(spark, 3000, n_keys=500, partitions=4)
    apply_changes(t, ch, batch_id=0)
    t = LakeTable(spark, root).load()
    before = t.read()
    n = before.count()

    # rewrite with a small per-file cap via compaction's write path
    df = t.read(include_deleted=True, include_system=True)
    entries = t.write_data_files(df, t.schema(), max_records_per_file=50)
    snap = t.commit(entries, replaced_buckets={e["bucket"] for e in t.manifest()},
                    operation="rewrite")
    t2 = LakeTable(spark, root).load()
    per_bucket: dict[int, int] = {}
    for e in t2.manifest():
        per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
    assert max(per_bucket.values()) > 1  # buckets actually split
    assert all(e["records"] <= 50 for e in t2.manifest())
    after = t2.read()
    assert after.count() == n
    assert after.exceptAll(before).count() == 0
