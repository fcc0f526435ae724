"""Incremental reads — the lake table as a CDC source
(LakeTable.read_incremental)."""

import pytest
from pyspark.sql import functions as F

from datax_spark.cdc.apply import apply_changes
from datax_spark.cdc.generator import changes_df
from datax_spark.lake.table import LakeTable
from tests.test_merge import SCHEMA as _S


@pytest.fixture()
def table3(spark, tmp_path):
    """Three batches applied in LSN order; returns (root, full change df,
    snapshot ids after each batch)."""
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, _S, key_col="url", num_buckets=8)
    ch = changes_df(spark, 6000, n_keys=700, partitions=4).cache()
    snaps = []
    for b, (lo, hi) in enumerate([(0, 2000), (2000, 4000), (4000, 6001)]):
        t = LakeTable(spark, root).load()
        apply_changes(t, ch.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi)), batch_id=b)
        snaps.append(LakeTable(spark, root).load().current_snapshot()["snapshot_id"])
    return root, ch, snaps


def _expected_feed(spark, ch, lo_lsn):
    """Keys whose FINAL winner (over the whole history) has lsn > lo_lsn,
    with U/D op — what a consumer needs to converge."""
    ch.createOrReplaceTempView("_inc_ch")
    return spark.sql(f"""
        SELECT url,
               CASE WHEN fop = 'D' THEN 'D' ELSE 'U' END AS _op
        FROM (SELECT url, max_by(op, struct(warc_ts, lsn)) fop,
                     max_by(lsn, struct(warc_ts, lsn)) flsn
              FROM _inc_ch GROUP BY url)
        WHERE flsn > {lo_lsn}
    """)


def test_feed_matches_sql_oracle(spark, table3):
    root, ch, snaps = table3
    t = LakeTable(spark, root).load()
    feed = t.read_incremental(snaps[0]).select("url", "_op")
    expect = _expected_feed(spark, ch, 2000)
    assert feed.exceptAll(expect).count() == 0
    assert expect.exceptAll(feed).count() == 0


def test_consumer_replay_converges(spark, table3):
    """Replaying base-snapshot state + the feed reproduces the final
    table exactly — the property a downstream consumer relies on."""
    root, ch, snaps = table3
    t = LakeTable(spark, root).load()
    base = t.read(snapshot_id=snaps[0])
    feed = t.read_incremental(snaps[0])
    upserts = feed.filter(F.col("_op") == "U").drop("_op")
    deletes = feed.filter(F.col("_op") == "D").select("url")
    replayed = (base.join(feed.select("url"), "url", "left_anti")
                .unionByName(upserts)
                .join(deletes, "url", "left_anti"))
    final = t.read()
    assert replayed.exceptAll(final).count() == 0
    assert final.exceptAll(replayed).count() == 0


def test_bounded_window_and_empty_feed(spark, table3):
    root, ch, snaps = table3
    t = LakeTable(spark, root).load()
    # window (s1, s1] is empty
    assert t.read_incremental(snaps[1], snaps[1]).count() == 0
    # (s0, s1] sees only batch-1 winners
    w = t.read_incremental(snaps[0], snaps[1]).select("url", "_op")
    expect = _expected_feed(spark, ch.filter("lsn <= 4000"), 2000)
    assert w.exceptAll(expect).count() == 0
    assert expect.exceptAll(w).count() == 0


def test_compaction_does_not_pollute_feed(spark, table3):
    """Compaction and rebucket rewrite old rows into NEW files; the LSN
    watermark keeps them out of the feed."""
    root, ch, snaps = table3
    t = LakeTable(spark, root).load()
    before = t.read_incremental(snaps[0]).select("url", "_op")
    n_before = before.count()
    t.compact_buckets(min_files_per_bucket=1)
    t2 = LakeTable(spark, root).load()
    after_compact = t2.read_incremental(snaps[0]).select("url", "_op")
    assert after_compact.count() == n_before
    assert after_compact.exceptAll(before).count() == 0
    t2.rebucket(16)
    after_rebucket = LakeTable(spark, root).load().read_incremental(snaps[0]).select("url", "_op")
    assert after_rebucket.exceptAll(before).count() == 0
    assert before.exceptAll(after_rebucket).count() == 0


def test_deletes_carry_op_d(spark, table3):
    root, ch, snaps = table3
    feed = LakeTable(spark, root).load().read_incremental(snaps[0])
    n_d = feed.filter(F.col("_op") == "D").count()
    expect_d = _expected_feed(spark, ch, 2000).filter("_op = 'D'").count()
    assert n_d == expect_d > 0


def test_non_monotone_lsn_needs_relaxed_watermark(spark, tmp_path):
    """Per-shard LSN spaces break the global-watermark exactness contract:
    a change whose LSN is below the base watermark but whose ts wins LWW
    is invisible to the strict feed; assume_monotone_lsn=False emits a
    convergent superset that carries it."""
    import datetime as dt

    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, _S, key_col="url", num_buckets=4)

    def batch(rows):
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, lang string, "
                  "op string, lsn long")

    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    apply_changes(t, batch([("a", t1, None, "en", "I", 100),
                            ("b", t1, None, "en", "I", 200)]), batch_id=0)
    t = LakeTable(spark, root).load()
    s0 = t.current_snapshot()["snapshot_id"]
    # "shard 2" counter: lsn 5 < watermark 200, but newer ts → wins LWW
    apply_changes(t, batch([("a", t2, None, "de", "U", 5)]), batch_id=1)
    t = LakeTable(spark, root).load()
    assert t.read().filter("url = 'a'").first().lang == "de"  # change applied

    strict = t.read_incremental(s0)
    assert strict.filter("url = 'a'").count() == 0  # the documented blind spot

    relaxed = t.read_incremental(s0, assume_monotone_lsn=False)
    row = relaxed.filter("url = 'a'").first()
    assert row is not None and row.lang == "de" and row._op == "U"


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_read_changes_pre_post_images(spark, tmp_path, mode):
    """CDF with pre/post images: updates emit both images, deletes carry
    old values, inserts only the new row; insert+delete inside the
    window nets to nothing; exact through CoW rewrites and MoR deltas."""
    import datetime as dt

    root = str(tmp_path / "t")
    LakeTable.create(spark, root, _S, key_col="url", num_buckets=4)

    def _b(rows, bid):
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, lang string, lsn long, op string")
        t = LakeTable(spark, root).load()
        apply_changes(t, df, batch_id=bid, merge_mode=mode)
        return LakeTable(spark, root).load().current_snapshot()["snapshot_id"]

    d = lambda i: dt.datetime(2024, 1, i)
    s1 = _b([(f"https://x/{k}", d(1), "v1", 10 + k, "I") for k in range(5)], 0)
    s2 = _b([("https://x/2", d(2), "v2", 20, "U"),      # update
             ("https://x/3", d(2), None, 21, "D"),      # delete
             ("https://x/9", d(2), "v1", 22, "I"),      # insert
             ("https://x/7", d(2), "tmp", 23, "I")], 1) # insert...
    s3 = _b([("https://x/7", d(3), None, 30, "D")], 2)  # ...then delete

    t = LakeTable(spark, root).load()
    cdf = {(r["url"], r["_change_type"]): r["lang"]
           for r in t.read_changes(s1, s3).collect()}
    assert cdf == {
        ("https://x/9", "insert"): "v1",
        ("https://x/2", "update_preimage"): "v1",
        ("https://x/2", "update_postimage"): "v2",
        ("https://x/3", "delete"): "v1",       # old values on the delete
    }

    # single-hop feed s2->s3 sees the delete of a key that EXISTED at s2
    cdf2 = {(r["url"], r["_change_type"]): r["lang"]
            for r in t.read_changes(s2, s3).collect()}
    assert cdf2 == {("https://x/7", "delete"): "tmp"}
