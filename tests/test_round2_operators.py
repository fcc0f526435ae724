"""JDBC upsert statement parity, cast-failure salvage, LSH recall,
ngram posting cap, and the sharded CDC source fixture."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F, types as T

from datax_spark.sources.jdbc_sql import (
    execute_sqls,
    on_duplicate_key_update,
    render_pre_post_sqls,
    staging_upsert_plan,
    write_template,
)


# ------------------------------------------------------------- jdbc sql

def test_write_template_matches_reference_strings():
    cols = ["a", "b", "c"]
    # WriterUtil.getWriteTemplate output, byte-for-byte
    assert write_template(cols, "insert") == "insert INTO %s (a,b,c) VALUES(?,?,?)"
    assert write_template(cols, "replace") == "replace INTO %s (a,b,c) VALUES(?,?,?)"
    assert (
        write_template(cols, "update", dialect="mysql")
        == "INSERT INTO %s (a,b,c) VALUES(?,?,?)"
        " ON DUPLICATE KEY UPDATE a=VALUES(a),b=VALUES(b),c=VALUES(c)"
    )
    # verb passes through verbatim (reference appends writeMode directly)
    assert write_template(["x"], "insert ignore") == "insert ignore INTO %s (x) VALUES(?)"
    # non-MySQL 'update' downgrades to replace (reference guard)
    assert write_template(["x"], "update", dialect="oracle") == "replace INTO %s (x) VALUES(?)"
    with pytest.raises(ValueError):
        write_template(cols, "merge")


def test_on_duplicate_key_update_empty():
    assert on_duplicate_key_update([]) == ""


def test_render_pre_post_sqls_table_placeholder():
    out = render_pre_post_sqls(
        ["delete from @table", "", "  ", "analyze table @table"], "pages"
    )
    assert out == ["delete from pages", "analyze table pages"]
    assert render_pre_post_sqls(None, "pages") == []


def test_staging_upsert_plan_mysql_and_ansi():
    plan = staging_upsert_plan("t", ["k", "v", "w"], ["k"], dialect="mysql")
    assert plan["load_table"] == "t_datax_stg"
    assert plan["pre"][1] == "CREATE TABLE t_datax_stg LIKE t"
    assert plan["post"][0] == (
        "INSERT INTO t (k,v,w) SELECT k,v,w FROM t_datax_stg"
        " ON DUPLICATE KEY UPDATE v=VALUES(v),w=VALUES(w)"
    )
    ansi = staging_upsert_plan("t", ["k", "v"], ["k"], dialect="ansi")
    assert ansi["post"][0] == (
        "MERGE INTO t t USING t_datax_stg s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k,v) VALUES (s.k,s.v)"
    )
    with pytest.raises(ValueError):
        staging_upsert_plan("t", ["k"], [])


def test_execute_sqls_fails_fast_with_statement():
    ran = []

    def ex(sql):
        if "boom" in sql:
            raise OSError("down")
        ran.append(sql)

    with pytest.raises(RuntimeError, match="boom"):
        execute_sqls(ex, ["ok 1", "boom 2", "never 3"])
    assert ran == ["ok 1"]


class _FakeWriter:
    def __init__(self, log):
        self.log = log
        self.opts = {}

    def format(self, f):
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def mode(self, m):
        return self

    def save(self):
        self.log.append(("save", self.opts.get("dbtable")))


class _FakeDF:
    def __init__(self, columns, log):
        self.columns = columns
        self._log = log

    def repartition(self, n):
        return self

    @property
    def write(self):
        return _FakeWriter(self._log)


def test_write_jdbc_upsert_orchestration_order():
    from datax_spark.sources.files import write_jdbc_batched

    log = []
    df = _FakeDF(["k", "v"], log)
    write_jdbc_batched(
        df, "jdbc:mysql://h/db", "t", write_mode="update", key_cols=["k"],
        pre_sql=["truncate @table_audit"], post_sql=["analyze table @table"],
        sql_executor=lambda s: log.append(("sql", s)),
        staging_token="",  # deterministic legacy staging name for assertion
    )
    kinds = [(k, v) for k, v in log]
    # staging pre → user preSql → batch load into staging → upsert+drop → user postSql
    assert kinds == [
        ("sql", "DROP TABLE IF EXISTS t_datax_stg"),
        ("sql", "CREATE TABLE t_datax_stg LIKE t"),
        ("sql", "truncate t_audit"),
        ("save", "t_datax_stg"),
        ("sql", "INSERT INTO t (k,v) SELECT k,v FROM t_datax_stg"
                " ON DUPLICATE KEY UPDATE v=VALUES(v)"),
        ("sql", "DROP TABLE t_datax_stg"),
        ("sql", "analyze table t"),
    ]


def test_write_jdbc_upsert_without_executor_raises():
    from datax_spark.sources.files import write_jdbc_batched

    df = _FakeDF(["k", "v"], [])
    with pytest.raises(RuntimeError, match="sql_executor"):
        write_jdbc_batched(df, "jdbc:mysql://h/db", "t", write_mode="replace", key_cols=["k"])


# ---------------------------------------------------------- cast salvage

def test_cast_salvage_routes_malformed_csv_rows(spark, tmp_path):
    from datax_spark.quarantine import salvage_casts
    from datax_spark.sources.files import read_csv

    p = tmp_path / "in.csv"
    p.write_text(
        "1,2024-01-01 00:00:00,100\n"
        "2,not-a-timestamp,200\n"      # bad ts → dead letter
        "3,2024-01-03 00:00:00,xyz\n"  # bad long → dead letter
        "4,2024-01-04 00:00:00,400\n"
    )
    raw = read_csv(spark, str(p), columns=[
        {"index": 0, "name": "id", "type": "string"},
        {"index": 1, "name": "ts", "type": "string"},
        {"index": 2, "name": "n", "type": "string"},
    ])
    qdir = str(tmp_path / "dead")
    typed, dirty = salvage_casts(
        raw, {"id": "bigint", "ts": "timestamp", "n": "bigint"}, quarantine_dir=qdir
    )
    rows = typed.collect()  # must NOT raise under ANSI mode
    assert dirty == 2 and len(rows) == 2
    assert {r["id"] for r in rows} == {1, 4}
    assert dict(typed.dtypes)["ts"] == "timestamp"
    reasons = sorted(r["_dirty_reason"] for r in
                     spark.read.parquet(qdir).select("_dirty_reason").collect())
    assert reasons == ["cast failure: n as bigint", "cast failure: ts as timestamp"]


def test_cast_salvage_error_limits(spark, tmp_path):
    from datax_spark.quarantine import ErrorLimitExceeded, ErrorLimits, salvage_casts

    df = spark.createDataFrame([("a",), ("1",)], "v string")
    with pytest.raises(ErrorLimitExceeded):
        typed, _ = salvage_casts(df, {"v": "bigint"}, limits=ErrorLimits(record=0))


# ------------------------------------------------------------ lsh recall

def test_lsh_recall_measured_above_floor(spark):
    from datax_spark.operators.similarity import lsh_recall

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    r = lsh_recall(emb, queries, dim=dim, k=10)
    # measured 2026-08 (6 planes x 6 tables, near-random fixture vectors —
    # the hard case for cosine LSH): 0.78; pin a regression floor
    assert 0.6 <= r <= 1.0


# ---------------------------------------------------- sharded CDC source

def test_sharded_source_adversarial_interleave(spark, tmp_path):
    """N shard dirs, each ordered by LSN only WITHIN the shard; file
    arrival order interleaves shards adversarially (a batch can carry a
    later shard-A slice before an earlier shard-B slice). The stateful
    merge must still converge to the global LWW oracle."""
    from datax_spark.cdc.generator import changes_df
    from datax_spark.cdc.pipeline import CHANGE_SCHEMA, run_stream
    from datax_spark.lake.table import LakeTable

    base = str(tmp_path)
    src = f"{base}/src"
    n_shards = 3
    ch = changes_df(spark, 6000, n_keys=800, partitions=8).cache()
    # shard assignment by key hash (per-shard LSN order, global disorder)
    sharded = ch.withColumn("_shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)))
    for s in range(n_shards):
        os.makedirs(f"{src}/shard={s}", exist_ok=True)
    # each shard splits into 3 LSN-ordered slices; file NAMES interleave
    # adversarially: shard 0 slice 2 lists before shard 1 slice 0, etc.
    slices = []
    for s in range(n_shards):
        sh = sharded.filter(F.col("_shard") == s).drop("_shard")
        lo, hi = sh.agg(F.min("lsn"), F.max("lsn")).first()
        span = (hi - lo) // 3 + 1
        for i in range(3):
            slices.append((s, i, sh.filter(
                (F.col("lsn") >= lo + i * span) & (F.col("lsn") < lo + (i + 1) * span))))
    # adversarial arrival: reverse-slice, shard-major interleave
    order = sorted(slices, key=lambda t: (-t[1], t[0]))
    for arrival, (s, i, sl) in enumerate(order):
        stg = f"{base}/stg{s}_{i}"
        sl.coalesce(1).write.parquet(stg)
        part = glob.glob(f"{stg}/part-*.parquet")[0]
        shutil.move(part, f"{src}/shard={s}/a{arrival:02d}.parquet")

    schema = T.StructType([f for f in CHANGE_SCHEMA.fields if f.name not in ("lsn", "op")])
    root = f"{base}/table"
    LakeTable.create(spark, root, schema, key_col="url", num_buckets=8)
    run_stream(spark, f"{src}/shard=*", root, f"{base}/ckpt",
               max_files_per_trigger=2, available_now=True, timeout_sec=240)
    t = LakeTable(spark, root).load()
    ch.createOrReplaceTempView("_shard_ch")
    expected = spark.sql(
        "SELECT url, max_by(lang, struct(warc_ts, lsn)) AS lang FROM _shard_ch "
        "GROUP BY url HAVING max_by(op, struct(warc_ts, lsn)) <> 'D'"
    )
    got = t.read().select("url", "lang")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


# --------------------------------------------------------- ngram df cap

def test_ngram_jaccard_max_df_drops_hot_shingles(spark):
    from datax_spark.operators.dedup import ngram_jaccard_pairs

    # "common common common" shingle appears in ALL docs (hot posting);
    # docs 1/2 also share a rare tail, doc 3 shares only the hot shingle.
    rows = [
        (1, "common common common rare tail one two"),
        (2, "common common common rare tail one three"),
        (3, "common common common unrelated body text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r.id_a, r.id_b) for r in
             ngram_jaccard_pairs(df, threshold=0.1).collect()}
    capped = {(r.id_a, r.id_b) for r in
              ngram_jaccard_pairs(df, threshold=0.1, max_df=2).collect()}
    assert (1, 2) in exact and (1, 3) in exact
    # cap drops the all-docs shingle: 1-2 still found via rare shingles,
    # 1-3 (hot-shingle-only overlap) disappears
    assert (1, 2) in capped and (1, 3) not in capped


def test_ivf_topk_recall_above_floor(spark):
    from datax_spark.operators.similarity import cosine_topk, cosine_topk_ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = cosine_topk(emb, queries, k=10).select("qid", "vec_id")
    approx = cosine_topk_ivf(emb, queries, k=10, n_centroids=16, n_probe=4).select("qid", "vec_id")
    n_exact = exact.count()
    recall = exact.join(approx, ["qid", "vec_id"]).count() / n_exact
    # n_probe/n_centroids = 1/4 of the corpus scanned; seed (untrained)
    # centroids on near-random vectors — floor pinned from measurement
    assert recall >= 0.4, recall
    # every query must at least find itself (it lives in a probed list)
    assert approx.filter(F.col("qid") == F.col("vec_id")).count() == 20
