"""Round-3 ADVICE regression tests (VERDICT/ADVICE round 2).

1. legacy manifest entries with deleted=None must not crash commit
   (round-1 JSON manifests round-trip through the parquet manifest with
   the key present but None).
2. MoR delta entries without a pinned lww_ts_col must raise loudly, not
   silently collapse by a hardcoded domain column.
3. expire_snapshots performs the same optimistic-concurrency check as
   commit (no silent clobber of a concurrent writer).
4. staging table names are unique per run by default (concurrent upserts
   against one target cannot drop each other's staging table).
5. jdbcwriter credentials reach the Spark bulk INSERT options, not just
   the pre/post executor.
"""

import os

import pytest
from pyspark.sql import Row, types as T

from datax_spark.lake.merge import bulk_load
from datax_spark.lake.table import (
    CommitConflict,
    LakeTable,
    _atomic_write_manifest,
    _read_manifest,
)

USER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk_table(spark, tmp_path, name="t"):
    t = LakeTable.create(spark, str(tmp_path / name), USER_SCHEMA, key_col="url", num_buckets=4)
    import datetime

    df = spark.createDataFrame(
        [Row(url=f"u{i}", warc_ts=datetime.datetime(2024, 1, 1, i), v=i) for i in range(1, 6)],
        USER_SCHEMA,
    )
    bulk_load(t, df, lsn=1)
    return t


def test_legacy_manifest_deleted_none_commit_survives(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    # simulate a round-1 JSON-era entry round-tripped through the parquet
    # manifest: 'deleted'/'kind' present but None
    snap = t.current_snapshot()
    entries = t.manifest()
    for e in entries:
        e["deleted"] = None
        e["kind"] = None
    mf = os.path.join(t.root, snap["manifest"])
    os.remove(mf)
    _atomic_write_manifest(mf, entries)
    back = _read_manifest(mf)
    assert all(e["deleted"] == 0 and e["kind"] == "base" for e in back)
    # the second commit after upgrade used to raise TypeError on live_rows
    snap2 = t.commit([], set(), operation="noop")
    assert snap2["summary"]["live_rows"] == 5


def test_mor_delta_without_lww_ts_col_raises(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    df = t.read(include_deleted=True, include_system=True)
    entries = t.write_data_files(df, t.schema(), kind="delta")
    t.commit(entries, set(), operation="append")  # no lww_ts_col pinned
    with pytest.raises(ValueError, match="lww_ts_col"):
        t.read()


def test_expire_snapshots_concurrency_check(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    stale = LakeTable(spark, t.root).load()
    t.commit([], set(), operation="noop")  # table advances under `stale`
    with pytest.raises(CommitConflict):
        stale.expire_snapshots(keep_last=1)


def test_staging_name_unique_per_run():
    from datax_spark.sources.files import write_jdbc_batched

    names = []

    class _W:
        def __init__(self):
            self.opts = {}

        def format(self, f):
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def mode(self, m):
            return self

        def save(self):
            names.append(self.opts.get("dbtable"))

    class _DF:
        columns = ["k", "v"]

        def repartition(self, n):
            return self

        @property
        def write(self):
            return _W()

    for _ in range(2):
        write_jdbc_batched(
            _DF(), "jdbc:mysql://h/db", "t", write_mode="replace",
            key_cols=["k"], sql_executor=lambda s: None,
        )
    assert len(names) == 2 and names[0] != names[1]
    assert all(n.startswith("t_datax_stg_") for n in names)


def test_jdbc_bulk_write_gets_credentials():
    from datax_spark.sources.files import write_jdbc_batched

    seen = {}

    class _W:
        def __init__(self):
            self.opts = {}

        def format(self, f):
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def mode(self, m):
            return self

        def save(self):
            seen.update(self.opts)

    class _DF:
        columns = ["k", "v"]

        def repartition(self, n):
            return self

        @property
        def write(self):
            return _W()

    write_jdbc_batched(
        _DF(), "jdbc:mysql://h/db", "t", write_mode="insert",
        user="alice", password="s3cret",
    )
    assert seen["user"] == "alice" and seen["password"] == "s3cret"
