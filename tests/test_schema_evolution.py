"""End-to-end schema evolution through the CDC apply path (FIXTURES §3):
mid-stream add column + int→bigint widening, old rows read as NULL."""

from pyspark.sql import functions as F, types as T

from datax_spark.cdc.apply import apply_changes
from datax_spark.cdc.generator import changes_df
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def test_add_and_widen_midstream(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key_col="url", num_buckets=4)
    ch = changes_df(spark, 2000, n_keys=400, partitions=4, evolve_from_lsn=1001).cache()

    early = ch.filter(F.col("lsn") <= 1000).drop("fetch_status", "content_len")
    m1 = apply_changes(t, early, batch_id=0)
    assert m1["schema_changes"] == []
    assert "fetch_status" not in t.read().columns

    late = ch.filter(F.col("lsn") > 1000)
    assert dict(late.dtypes)["content_len"] == "bigint"
    m2 = apply_changes(t, late, batch_id=1)
    assert any("add column fetch_status" in c for c in m2["schema_changes"])
    assert any("add column content_len" in c for c in m2["schema_changes"])

    out = t.read()
    assert "fetch_status" in out.columns and "content_len" in out.columns
    # rows last touched by early events read NULL for the added columns
    nulls = out.filter(F.col("fetch_status").isNull()).count()
    assert nulls > 0
    # content_len values beyond int range survived (widened path)
    assert out.filter(F.col("content_len") > 2**31).count() > 0
    # schema log advanced once
    assert t._require_meta()["current_schema_id"] == 1


def test_widen_int_to_bigint_in_place(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        T.StructType(
            [
                T.StructField("url", T.StringType(), False),
                T.StructField("warc_ts", T.TimestampType(), True),
                T.StructField("n", T.IntegerType(), True),
            ]
        ),
        key_col="url",
        num_buckets=2,
    )
    mk = lambda lsn, n_type, n_val: spark.createDataFrame(
        [(lsn, "I", f"https://k/{lsn}", n_val)], f"lsn long, op string, url string, n {n_type}"
    ).withColumn("warc_ts", F.timestamp_seconds(F.lit(1704067200) + F.col("lsn")))
    apply_changes(t, mk(1, "int", 7), batch_id=0)
    m = apply_changes(t, mk(2, "bigint", 2**40), batch_id=1)
    assert any("widen column n int -> bigint" in c for c in m["schema_changes"])
    vals = {r["url"]: r["n"] for r in t.read().collect()}
    assert vals[f"https://k/1"] == 7 and vals[f"https://k/2"] == 2**40
    # old files (written as int) read correctly under the widened schema
    assert dict(t.read().dtypes)["n"] == "bigint"


def test_schema_evolution_under_mor(spark, tmp_path):
    """A widened/extended change batch applied as MoR deltas: old base
    files read under their own schema, deltas under the evolved one,
    aligned + collapsed at scan time."""
    from datax_spark.cdc.apply import apply_changes
    from datax_spark.lake.table import LakeTable
    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, key_col="url", num_buckets=4)
    mk = lambda rows, ddl: spark.createDataFrame(rows, ddl).withColumn(
        "warc_ts", F.to_timestamp("warc_ts")
    )
    apply_changes(t, mk([(1, "I", "a", "2024-01-01 00:01:00", "en")],
                        "lsn long, op string, url string, warc_ts string, lang string"),
                  batch_id=0, ts_col="warc_ts", merge_mode="mor")
    # batch 2 adds a column → schema evolves inside a MoR delta commit
    apply_changes(t, mk([(2, "I", "b", "2024-01-01 00:02:00", "de", 200)],
                        "lsn long, op string, url string, warc_ts string, lang string, fetch_status long"),
                  batch_id=1, ts_col="warc_ts", merge_mode="mor")
    rows = {r["url"]: (r["lang"], r["fetch_status"]) for r in t.read().collect()}
    assert rows == {"a": ("en", None), "b": ("de", 200)}
