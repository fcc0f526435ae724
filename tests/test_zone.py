"""Zone maps: cluster_by rewrite + manifest min/max file pruning.

The secondary-column data-skipping layer on top of the bucket layout
(Iceberg sort-order / Delta OPTIMIZE ZORDER analog): `cluster_by`
sorts each bucket by the zone column and records per-file min/max in
the manifest; `scan_zone` skips files from pure manifest math —
byte-identical results to a full-scan filter, with the prune plan
itself asserted (not trusted)."""

import datetime

from pyspark.sql import functions as F, types as T

from datax_spark.lake.merge import bulk_load, merge_into
from datax_spark.lake.table import LakeTable, _zone_key

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def _mk(spark, root, nb=4):
    return LakeTable.create(spark, root, SCHEMA, key_col="url", num_buckets=nb)


def _pages(spark, n):
    # timestamps deliberately SHUFFLED across the key space so the
    # pre-clustering files have wide (unprunable) zones
    return spark.range(n).select(
        F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("id"), F.lit(1_000_000))
        ).alias("warc_ts"),
        (F.col("id") % 97).cast("double").alias("score"),
    )


def _ts(sec_offset):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec_offset)


def test_zone_key_orderable_domains():
    assert _zone_key(5) == 5 and _zone_key(2.5) == 2.5 and _zone_key("ab") == "ab"
    assert _zone_key(datetime.datetime(1970, 1, 1, 0, 0, 1)) == 1_000_000
    assert _zone_key(datetime.date(1970, 1, 2)) == 1
    assert _zone_key(True) is None  # bool would zone-map as int noise
    assert _zone_key(b"raw") is None  # unsupported => never pruned


def test_cluster_by_records_zones_and_scan_matches_full_filter(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    bulk_load(t, _pages(spark, 4000))
    # pre-clustering: no zone stats anywhere, scan_zone with explicit col
    # falls back to reading everything (conservative keep)
    kept, pruned = t.zone_prune_plan(_ts(0), _ts(10), zone_col="warc_ts")
    assert pruned == [] and len(kept) == len(t.manifest())

    t.cluster_by("warc_ts", max_records_per_file=300)
    ents = t.manifest()
    assert all(e["zone_col"] == "warc_ts" for e in ents)
    assert all(e["zone_min"] is not None and e["zone_max"] is not None for e in ents)
    assert len(ents) > 4  # max_records_per_file split buckets into slices

    lo, hi = _ts(100_000), _ts(200_000)
    kept, pruned = t.zone_prune_plan(lo, hi)
    assert pruned, "narrow range over clustered files must prune something"
    got = t.scan_zone(lo, hi).orderBy("url")
    want = (
        t.read()
        .filter(F.col("warc_ts").between(F.lit(lo), F.lit(hi)))
        .orderBy("url")
    )
    assert got.collect() == want.collect()
    # half-open ranges
    assert t.scan_zone(lo=hi).count() == t.read().filter(F.col("warc_ts") >= hi).count()
    assert t.scan_zone(hi=lo).count() == t.read().filter(F.col("warc_ts") <= lo).count()


def test_later_writes_keep_capturing_zones(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    bulk_load(t, _pages(spark, 500))
    t.cluster_by("warc_ts")
    # a post-clustering CoW merge writes new files -> they must carry zones
    ch = _pages(spark, 100).select(
        "url", "warc_ts", F.lit(1.0).alias("score"),
        F.lit(9_000_000).cast("bigint").alias("lsn"), F.lit("U").alias("op"),
    )
    merge_into(t, ch, ts_col="warc_ts", lsn_col="lsn", stream_id="s", batch_id=0)
    assert all(e["zone_min"] is not None for e in t.manifest())


def test_mor_delta_buckets_are_never_pruned(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    bulk_load(t, _pages(spark, 1000))
    t.cluster_by("warc_ts", max_records_per_file=100)
    # move ONE key far outside every zone via a MoR delta: the LWW winner
    # now lives in a delta file whose bucket must be read whole
    moved = _ts(5_000_000)
    ch = spark.createDataFrame(
        [("https://x/7", moved, 1.0, 10_000_000, "U")],
        "url string, warc_ts timestamp, score double, lsn long, op string",
    )
    merge_into(t, ch, ts_col="warc_ts", lsn_col="lsn", stream_id="s",
               batch_id=0, merge_mode="mor")
    delta_bucket = t.key_bucket("https://x/7")
    kept, pruned = t.zone_prune_plan(moved, moved)
    assert all(e["bucket"] != delta_bucket for e in pruned)
    rows = t.scan_zone(moved, moved).collect()
    assert [r.url for r in rows] == ["https://x/7"]
    # and the moved key is NOT seen at its stale position
    assert t.scan_zone(_ts(0), _ts(1_000_000)).filter(
        F.col("url") == "https://x/7").count() == 0


def test_numeric_zone_column_and_string_order_correctness(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    bulk_load(t, _pages(spark, 1000))
    t.cluster_by("score", max_records_per_file=100)
    got = t.scan_zone(10.0, 20.0).count()
    want = t.read().filter(F.col("score").between(10.0, 20.0)).count()
    assert got == want > 0
    _, pruned = t.zone_prune_plan(10.0, 20.0)
    assert pruned


def test_compaction_preserves_zone_capture(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), nb=2)
    bulk_load(t, _pages(spark, 300))
    t.cluster_by("warc_ts")
    bulk_load(t, _pages(spark, 300))  # second write -> 2 files/bucket
    t.compact_buckets(min_files_per_bucket=2)
    ents = t.manifest()
    assert ents and all(e["zone_min"] is not None for e in ents)


def test_recluster_by_different_column(spark, tmp_path):
    # re-clustering rewrites every file, so changing the pinned zone_col
    # is allowed (the superseded pin has no surviving reader); old-column
    # zones are replaced wholesale
    t = _mk(spark, str(tmp_path / "t"))
    bulk_load(t, _pages(spark, 500))
    t.cluster_by("warc_ts")
    t.cluster_by("score", max_records_per_file=100)
    assert all(e["zone_col"] == "score" for e in t.manifest())
    assert t.scan_zone(0.0, 5.0).count() == t.read().filter(
        F.col("score").between(0.0, 5.0)).count()


def test_legacy_manifest_without_zone_columns_still_reads(spark, tmp_path):
    # entries missing the zone keys entirely (old manifests round-trip
    # through _read_manifest with .get defaults) must be kept, not crash
    t = _mk(spark, str(tmp_path / "t"))
    bulk_load(t, _pages(spark, 100))
    for e in t.manifest():
        e.pop("zone_col", None), e.pop("zone_min", None), e.pop("zone_max", None)
    kept, pruned = t.zone_prune_plan(_ts(0), _ts(1), zone_col="warc_ts")
    assert pruned == [] and len(kept) == len(t.manifest())
