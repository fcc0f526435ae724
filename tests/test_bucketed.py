"""bucket_local_agg SQL-semantics edges (round-4 self-review findings):
all-null groups, count-col rejection, snapshot pinning."""

import pytest
from pyspark.sql import functions as F, types as T

from datax_spark.lake.bucketed import bucket_local_agg, read_bucketed
from datax_spark.lake.merge import bulk_load, merge_into
from datax_spark.lake.table import LakeTable


def _table(spark, root, nbuckets=4):
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("score", T.LongType(), True),
    ])
    return LakeTable.create(spark, root, schema, key_col="url", num_buckets=nbuckets)


def _rows(spark, n, score_expr):
    return spark.range(n).select(
        F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("warc_ts"),
        score_expr.alias("score"),
    )


def test_all_null_groups_match_spark_sql_semantics(spark, tmp_path):
    """sum/min/max over an all-null group must be NULL (not 0 / not an
    Arrow crash on integer columns) — exactly what groupBy(key) gives."""
    t = _table(spark, str(tmp_path / "t"))
    # even ids get NULL score; odd ids get id value
    bulk_load(t, _rows(spark, 40, F.when(F.col("id") % 2 == 1, F.col("id"))))
    agg = bucket_local_agg(
        t, {"n": ("count", None), "s": ("sum", "score"), "mx": ("max", "score")})
    got = {r["url"]: (r["n"], r["s"], r["mx"]) for r in agg.collect()}
    ref = (t.read().groupBy("url")
           .agg(F.count("*").alias("n"), F.sum("score").alias("s"),
                F.max("score").alias("mx")))
    exp = {r["url"]: (r["n"], r["s"], r["mx"]) for r in ref.collect()}
    assert got == exp
    assert any(v[1] is None for v in got.values())  # null groups exercised


def test_count_with_column_rejected(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    bulk_load(t, _rows(spark, 4, F.col("id")))
    with pytest.raises(ValueError, match="count is count"):
        bucket_local_agg(t, {"n": ("count", "score")})


def test_read_bucketed_pins_the_enumerated_snapshot(spark, tmp_path):
    """Branches must all read the snapshot current at enumeration time —
    a commit between branch construction and action must not leak in."""
    t = _table(spark, str(tmp_path / "t"))
    bulk_load(t, _rows(spark, 40, F.col("id")))
    parts = read_bucketed(t)
    # concurrent merge lands AFTER enumeration
    ch = _rows(spark, 40, F.col("id") * 100).select(
        "url", (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")).alias("warc_ts"),
        "score",
    ).withColumn("lsn", F.monotonically_increasing_id() + 10).withColumn("op", F.lit("U"))
    merge_into(t.load(), ch, merge_mode="mor")
    total = sum(df.count() for _b, df in parts)
    scores = sorted(r["score"] for _b, df in parts for r in df.collect())
    assert total == 40
    assert scores == list(range(40))  # pre-merge values, not id*100


def _two_tables(spark, base, nb1=4, nb2=4, rkey_type=T.LongType()):
    s1 = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("score", T.LongType(), True),
    ])
    s2 = T.StructType([
        T.StructField("url", rkey_type if isinstance(rkey_type, T.StringType) else T.StringType(), False),
        T.StructField("rank", T.LongType(), True),
        T.StructField("score", T.DoubleType(), True),  # name-collides with left
    ])
    t1 = LakeTable.create(spark, f"{base}/l", s1, key_col="url", num_buckets=nb1)
    t2 = LakeTable.create(spark, f"{base}/r", s2, key_col="url", num_buckets=nb2)
    return t1, t2


def test_bucket_local_join_inner_left_and_plan(spark, tmp_path):
    from datax_spark.lake.bucketed import bucket_local_join

    t1, t2 = _two_tables(spark, str(tmp_path))
    bulk_load(t1, _rows(spark, 40, F.col("id")))
    # right covers only even ids, with a colliding 'score' column
    right = spark.range(0, 40, 2).select(
        F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 10).alias("rank"),
        (F.col("id") / 2.0).alias("score"),
    )
    bulk_load(t2, right)

    inner = bucket_local_join(t1, t2, how="inner")
    assert "score_r" in inner.columns  # collision renamed
    plan = inner._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["url"]: (r["score"], r["rank"], r["score_r"]) for r in inner.collect()}
    assert len(got) == 20
    assert got["https://x/4"] == (4, 40, 2.0)

    left = bucket_local_join(t1, t2, how="left")
    rows = {r["url"]: (r["rank"], r["score_r"]) for r in left.collect()}
    assert len(rows) == 40
    assert rows["https://x/5"] == (None, None)  # miss -> NULLs, no crash
    assert rows["https://x/6"] == (60, 3.0)

    # reference parity against the exchange-ful plain join
    ref = (t1.read().join(
        t2.read().withColumnRenamed("score", "score_r").withColumnRenamed("url", "_u"),
        F.col("url") == F.col("_u"), "left").drop("_u"))
    assert sorted(map(tuple, left.select(*ref.columns).collect())) == \
        sorted(map(tuple, ref.collect()))


def test_bucket_local_join_rejects_mismatched_layouts(spark, tmp_path):
    from datax_spark.lake.bucketed import bucket_local_join

    t1, t2 = _two_tables(spark, str(tmp_path), nb1=4, nb2=8)
    with pytest.raises(ValueError, match="bucket counts"):
        bucket_local_join(t1, t2)
    with pytest.raises(ValueError, match="inner|left"):
        bucket_local_join(t1, t1, how="cross")
