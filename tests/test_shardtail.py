"""Sharded log-tail Python DataSource (sources/shardtail.py): batch
parity, stream rate limiting, kill/resume exactly-once, late files."""

import glob
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datax_spark.sources.shardtail import register_shard_tail


def _write_shard_file(root: str, shard: int, file_idx: int, lsns: list[int]):
    d = os.path.join(root, f"shard={shard}")
    os.makedirs(d, exist_ok=True)
    t = pa.table({
        "lsn": pa.array(lsns, pa.int64()),
        "op": pa.array(["I"] * len(lsns)),
        "url": pa.array([f"http://s{shard}.example/{v}" for v in lsns]),
    })
    pq.write_table(t, os.path.join(d, f"f{file_idx:04d}.parquet"))


def _fixture(root: str, n_shards: int = 3, files_per_shard: int = 3, rows_per_file: int = 40):
    for s in range(n_shards):
        for f in range(files_per_shard):
            base = s * 100_000 + f * rows_per_file
            _write_shard_file(root, s, f, list(range(base, base + rows_per_file)))
    return n_shards * files_per_shard * rows_per_file


@pytest.fixture()
def shard_root(tmp_path):
    root = str(tmp_path / "tail")
    total = _fixture(root)
    return root, total


def test_batch_read_matches_plain_parquet(spark, shard_root):
    root, total = shard_root
    register_shard_tail(spark)
    got = spark.read.format("shard_tail").option("path", root).load()
    assert got.count() == total
    plain = spark.read.parquet(*glob.glob(f"{root}/shard=*/f*.parquet")).select(*got.columns)
    assert got.exceptAll(plain).count() == 0 and plain.exceptAll(got).count() == 0
    # one partition per shard (the reference's one-task-per-shard split)
    assert got.rdd.getNumPartitions() == 3


def _run_stream(spark, root, out, ckpt, max_rows=None, stop_rows=None, timeout=120):
    register_shard_tail(spark)
    reader = spark.readStream.format("shard_tail").option("path", root)
    if max_rows is not None:
        reader = reader.option("maxRowsPerTrigger", str(max_rows))
    q = (reader.load().writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(processingTime="300 milliseconds").start())
    try:
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            if stop_rows is not None and n >= stop_rows:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(30)


def test_stream_rate_limited_and_complete(spark, shard_root, tmp_path):
    root, total = shard_root
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_stream(spark, root, out, ckpt, max_rows=90, stop_rows=total)
    df = spark.read.parquet(out)
    assert df.count() == total  # every row exactly once
    assert df.select("lsn").distinct().count() == total
    # rate limit held: >1 micro-batch committed (360 rows / 90-row budget)
    commits = [f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")]
    assert len(commits) >= 4


def test_stream_kill_resume_exactly_once(spark, shard_root, tmp_path):
    root, total = shard_root
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # phase 1: small budget, stop early mid-stream
    _run_stream(spark, root, out, ckpt, max_rows=60, stop_rows=120)
    n1 = spark.read.parquet(out).count()
    assert 0 < n1 < total
    # phase 2: resume from checkpoint, drain to completion
    _run_stream(spark, root, out, ckpt, max_rows=1000, stop_rows=total)
    df = spark.read.parquet(out)
    assert df.count() == total
    assert df.select("lsn").distinct().count() == total  # no dup, no loss


def test_cdc_pipeline_through_shard_tail(spark, tmp_path):
    """End-to-end: change stream sharded by key hash → run_stream with
    source_format='shard_tail' → lake MERGE; final state matches the LWW
    SQL oracle in both the unbounded and rate-limited modes."""
    from pyspark.sql import types as T

    from datax_spark.cdc.generator import changes_df
    from datax_spark.cdc.pipeline import CHANGE_SCHEMA, run_stream
    from datax_spark.lake.table import LakeTable

    base = str(tmp_path)
    ch = changes_df(spark, 3000, n_keys=400, partitions=4).cache()
    # shard by key hash (per-key ordering preserved within a shard — the
    # guarantee a real log tail gives); files in lsn order per shard
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = ch.orderBy("lsn").toPandas()
    src = f"{base}/tail"
    for s in range(3):
        part = pdf[pdf["url"].map(hash) % 3 == s].reset_index(drop=True)
        d = os.path.join(src, f"shard={s}")
        os.makedirs(d, exist_ok=True)
        for fi, lo in enumerate(range(0, len(part), 400)):
            t = pa.Table.from_pandas(part.iloc[lo:lo + 400], preserve_index=False)
            i = t.schema.get_field_index("warc_ts")
            t = t.set_column(i, "warc_ts", t["warc_ts"].cast(pa.timestamp("us")))
            pq.write_table(t, os.path.join(d, f"f{fi:04d}.parquet"))

    ch.createOrReplaceTempView("_st_ch")
    expected = spark.sql(
        "SELECT url FROM (SELECT url, max_by(op, struct(warc_ts, lsn)) fop "
        "FROM _st_ch GROUP BY url) WHERE fop <> 'D'")

    schema = T.StructType([f for f in CHANGE_SCHEMA.fields if f.name not in ("lsn", "op")])
    for mode, extra in (("bulk", {}), ("trickle", {"max_rows_per_trigger": 800})):
        root, ckpt = f"{base}/table_{mode}", f"{base}/ckpt_{mode}"
        LakeTable.create(spark, root, schema, key_col="url", num_buckets=8)
        run_stream(spark, src, root, ckpt, source_format="shard_tail",
                   available_now=True, timeout_sec=240, **extra)
        got = LakeTable(spark, root).load().read().select("url")
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0


def test_spark_written_int96_timestamps(spark, tmp_path):
    """Spark writes parquet timestamps as INT96, which pyarrow reads as
    timestamp[ns]; the source must down-cast to µs or Spark's Arrow
    ingestion rejects the batch (regression: UNSUPPORTED_ARROWTYPE)."""
    from pyspark.sql import functions as F

    from datax_spark.cdc.generator import changes_df

    base = str(tmp_path)
    ch = changes_df(spark, 500, n_keys=100, partitions=2)
    for s in range(2):
        stg = f"{base}/stg{s}"
        ch.filter(F.col("lsn") % 2 == s).coalesce(1).write.parquet(stg)
        d = os.path.join(base, "tail", f"shard={s}")
        os.makedirs(d, exist_ok=True)
        import glob as g
        os.rename(g.glob(f"{stg}/part-*.parquet")[0], os.path.join(d, "f000.parquet"))
    register_shard_tail(spark)
    got = spark.read.format("shard_tail").option("path", f"{base}/tail").load()
    assert got.count() == 500
    assert dict(got.dtypes)["warc_ts"].startswith("timestamp")
    assert got.select(F.min("warc_ts")).first()[0] is not None


def test_late_files_picked_up(spark, shard_root, tmp_path):
    root, total = shard_root
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_stream(spark, root, out, ckpt, stop_rows=total)
    assert spark.read.parquet(out).count() == total
    # append a late file to shard 1 and a brand-new shard, then resume
    _write_shard_file(root, 1, 99, [999_001, 999_002])
    _write_shard_file(root, 7, 0, [777_001, 777_002, 777_003])
    _run_stream(spark, root, out, ckpt, stop_rows=total + 5)
    df = spark.read.parquet(out)
    assert df.count() == total + 5
    assert df.filter(F.col("url").startswith("http://s7.")).count() == 3


def test_empty_tail_dir_streams_idle_but_batch_read_fails(spark, tmp_path):
    """A tail root with no shards yet: streams idle (producer not
    started — shards join later), batch reads fail loudly."""
    from datax_spark.sources.shardtail import ShardTailBatchReader, _scan_shards

    root = str(tmp_path / "empty")
    os.makedirs(root)
    assert _scan_shards(root) == {}  # stream offset scans tolerate empty
    with pytest.raises(FileNotFoundError, match="no shard"):
        ShardTailBatchReader(root)


# ---------------------------- round-4: row-group pruning + footer cache


def test_overlapping_groups_selection_math():
    from datax_spark.sources.shardtail import _overlapping_groups

    sizes = [10, 10, 10, 10]  # rows 0..39
    assert _overlapping_groups(sizes, 0, 40) == ([0, 1, 2, 3], 0)
    assert _overlapping_groups(sizes, 12, 18) == ([1], 10)
    assert _overlapping_groups(sizes, 9, 11) == ([0, 1], 0)
    assert _overlapping_groups(sizes, 30, 40) == ([3], 30)
    assert _overlapping_groups(sizes, 10, 10) == ([], 0)  # empty range
    assert _overlapping_groups(sizes, 39, 100) == ([3], 30)  # clamped hi
    assert _overlapping_groups([], 0, 5) == ([], 0)


def test_slice_read_decodes_only_overlapping_row_groups(tmp_path, monkeypatch):
    """A bounded slice of a multi-row-group file must decode ∝ slice
    bytes, not the whole file: spy on ParquetFile.read_row_groups and
    assert only the overlapping groups were requested, and that the rows
    come back correct."""
    import pyarrow.parquet as pq_mod

    from datax_spark.sources import shardtail as st

    d = tmp_path / "shard=0"
    d.mkdir(parents=True)
    t = pa.table({"lsn": pa.array(range(1000), pa.int64())})
    pq.write_table(t, str(d / "f0000.parquet"), row_group_size=100)

    seen: list[list[int]] = []
    orig = pq_mod.ParquetFile.read_row_groups

    def spy(self, groups, **kw):
        seen.append(list(groups))
        return orig(self, groups, **kw)

    monkeypatch.setattr(pq_mod.ParquetFile, "read_row_groups", spy)
    files = [(str(d / "f0000.parquet"), 0, 1000)]
    batches = list(st._read_slice(st.ShardSlice("0", files, 250, 430)))
    got = [v for b in batches for v in b.column(0).to_pylist()]
    assert got == list(range(250, 430))
    assert seen == [[2, 3, 4]]  # groups 200-299, 300-399, 400-499 only


def test_footer_scan_is_cached_per_file(tmp_path, monkeypatch):
    """Second _scan_shards over an unchanged directory must read ZERO
    parquet footers (the driver-side manifest cache); a new file costs
    exactly one footer read."""
    import pyarrow.parquet as pq_mod

    from datax_spark.sources import shardtail as st

    root = str(tmp_path / "tail")
    _fixture(root, n_shards=2, files_per_shard=3, rows_per_file=10)

    calls = []
    orig = pq_mod.read_metadata

    def spy(path, *a, **kw):
        calls.append(str(path))
        return orig(path, *a, **kw)

    monkeypatch.setattr(pq_mod, "read_metadata", spy)
    st._FOOTER_ROWS.clear()
    first = st._scan_shards(root)
    assert len(calls) == 6
    calls.clear()
    second = st._scan_shards(root)
    assert calls == []  # steady-state trigger: scandir only, no footer I/O
    assert second == first
    _write_shard_file(root, 0, 99, [1, 2, 3])
    st._scan_shards(root)
    assert len(calls) == 1  # only the new file's footer

    # COLD driver restart (in-memory cache gone): the persistent
    # per-shard manifest sidecar answers every known file — zero footer
    # reads — and the result is identical
    calls.clear()
    st._FOOTER_ROWS.clear()
    cold = st._scan_shards(root)
    assert calls == []
    assert cold == st._scan_shards(root)
    # cold restart + one NEW file: exactly one footer read (O(new files))
    _write_shard_file(root, 1, 99, [7, 8])
    st._FOOTER_ROWS.clear()
    calls.clear()
    st._scan_shards(root)
    assert len(calls) == 1
    # a corrupt sidecar degrades to footer reads, never fails the scan
    import os as _os
    mdir = _os.path.join(root, "_manifest")
    for mf in _os.listdir(mdir):
        with open(_os.path.join(mdir, mf), "w") as fh:
            fh.write("{not json")
    st._FOOTER_ROWS.clear()
    calls.clear()
    healed = st._scan_shards(root)
    assert healed == cold or len(healed["1"]) == len(cold["1"]) + 1
    assert len(calls) == 8  # all files re-read once; sidecar self-heals
    st._FOOTER_ROWS.clear()
    calls.clear()
    st._scan_shards(root)
    assert calls == []
