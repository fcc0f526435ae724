"""Live JDBC round-trip against embedded Derby (ships in pyspark/jars).

Round 2 verified the JDBC reader/writer surface with recording fakes
only; this suite exercises the real path end-to-end in-sandbox:
create table → partitioned read (bounds + predicates modes) → bulk
insert → staged ANSI-MERGE upsert → batch→per-row degrade salvage
(``CommonRdbmsWriter.java:379-409``) routing rejected rows to the dirty
list.
"""

import pytest

from datax_spark.sources.files import read_jdbc_partitioned, write_jdbc_batched
from datax_spark.sources.jdbc_sql import jdbc_executor, jdbc_row_loader

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    ex = jdbc_executor(spark, url)
    ex("CREATE TABLE pages (id BIGINT NOT NULL PRIMARY KEY, lang VARCHAR(8), score DOUBLE)")
    return url, ex


def _df(spark, rows):
    return spark.createDataFrame(rows, "ID long, LANG string, SCORE double")


def _read_all(spark, url, table="pages"):
    df = read_jdbc_partitioned(spark, url, table, driver=DRIVER)
    return sorted((r["ID"], r["LANG"], r["SCORE"]) for r in df.collect())


def test_bulk_insert_and_partitioned_read(spark, derby):
    url, ex = derby
    rows = [(i, f"l{i % 3}", float(i) / 2) for i in range(1, 41)]
    write_jdbc_batched(_df(spark, rows), url, "pages", driver=DRIVER)
    # bounds mode: split contract → 4 partitions, all rows exactly once
    got = read_jdbc_partitioned(
        spark, url, "pages", split_col="ID", lower=1, upper=40,
        num_partitions=4, driver=DRIVER,
    )
    assert got.rdd.getNumPartitions() == 4
    assert sorted(r["ID"] for r in got.collect()) == list(range(1, 41))
    # predicates mode: explicit WHERE slices (the reference's custom-slice path)
    sliced = read_jdbc_partitioned(
        spark, url, "pages", predicates=["id <= 20", "id > 20"], driver=DRIVER,
    )
    assert sliced.rdd.getNumPartitions() == 2
    assert sliced.count() == 40


def test_staged_merge_upsert(spark, derby):
    url, ex = derby
    write_jdbc_batched(
        _df(spark, [(1, "en", 1.0), (2, "de", 2.0), (3, "fr", 3.0)]),
        url, "pages", driver=DRIVER,
    )
    # update 2 existing keys + insert 2 new through the staged ANSI MERGE
    write_jdbc_batched(
        _df(spark, [(2, "DE", 2.5), (3, "FR", 3.5), (4, "es", 4.0), (5, "it", 5.0)]),
        url, "pages", write_mode="update", key_cols=["ID"], dialect="ansi",
        sql_executor=ex, driver=DRIVER,
    )
    assert _read_all(spark, url) == [
        (1, "en", 1.0), (2, "DE", 2.5), (3, "FR", 3.5), (4, "es", 4.0), (5, "it", 5.0),
    ]
    # staging table dropped
    loader = jdbc_executor(spark, url)
    with pytest.raises(Exception):
        loader("SELECT 1 FROM pages_datax_stg_missing")


def test_pre_post_sql_hooks_run_live(spark, derby):
    url, ex = derby
    ex("CREATE TABLE pages_audit (note VARCHAR(32))")
    write_jdbc_batched(
        _df(spark, [(1, "en", 1.0)]), url, "pages", driver=DRIVER,
        pre_sql=["INSERT INTO @table_audit VALUES ('pre')"],
        post_sql=["INSERT INTO @table_audit VALUES ('post')"],
        sql_executor=ex,
    )
    notes = read_jdbc_partitioned(spark, url, "pages_audit", driver=DRIVER).collect()
    assert sorted(r["NOTE"] for r in notes) == ["post", "pre"]


def test_batch_to_row_degrade_salvages_dirty_rows(spark, derby):
    url, ex = derby
    good = [(1, "en", 1.0), (2, "de", 2.0), (3, "fr", 3.0)]
    bad = [(4, "way-too-long-lang", 4.0)]  # VARCHAR(8) overflow → bulk throws
    ok, dirty = write_jdbc_batched(
        _df(spark, good + bad), url, "pages", driver=DRIVER, dialect="ansi",
        sql_executor=ex, salvage_loader=jdbc_row_loader(spark, url),
    )
    assert ok == 3
    assert len(dirty) == 1
    row, reason = dirty[0]
    assert row[0] == 4 and reason  # offending row + db error text captured
    # good rows landed exactly once; dirty row absent
    assert _read_all(spark, url) == good


def test_salvage_not_enabled_reraises(spark, derby):
    url, ex = derby
    with pytest.raises(Exception):
        write_jdbc_batched(
            _df(spark, [(1, "way-too-long-lang", 1.0)]), url, "pages",
            driver=DRIVER, sql_executor=ex,
        )
    assert _read_all(spark, url) == []


def test_dry_run_precheck_probes_live(spark, derby, tmp_path):
    """JobContainer.preCheck analog: LIVE connectivity + splitPk probes
    against embedded Derby, file permission probes, failures captured as
    results (not raises)."""
    from datax_spark.config import JobConfig, pre_check

    url, ex = derby
    cfg = JobConfig(
        reader={"name": "jdbcreader",
                "parameter": {"jdbcUrl": url, "table": "pages", "splitPk": "id"}},
        writer={"name": "jdbcwriter",
                "parameter": {"jdbcUrl": url, "table": "pages"}},
    )
    res = pre_check(spark, cfg)
    assert res["ok"] and len(res["checks"]) == 3  # connect, splitPk bounds, writer
    # missing table → probe fails with the db error in detail, no raise
    bad = JobConfig(
        reader={"name": "jdbcreader",
                "parameter": {"jdbcUrl": url, "table": "no_such_table"}},
        writer={"name": "parquetwriter", "parameter": {"path": str(tmp_path / "out")}},
    )
    res2 = pre_check(spark, bad)
    assert not res2["ok"]
    failed = [c for c in res2["checks"] if not c["ok"]]
    assert len(failed) == 1 and failed[0]["detail"]
    # missing reader file path → failed probe
    res3 = pre_check(spark, JobConfig(
        reader={"name": "parquetreader", "parameter": {"path": str(tmp_path / "absent.parquet")}},
        writer={"name": "parquetwriter", "parameter": {"path": str(tmp_path / "out")}},
    ))
    assert not res3["ok"]
