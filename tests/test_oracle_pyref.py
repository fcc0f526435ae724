"""Pyref oracle package: pins the pure-python reference implementations
to the engine's JVM plans, value-for-value, on the sf0.001 fixtures.

These tests are what makes the VALUES-based DuckDB oracles in
``__spark_entry__.oracle_sql()`` trustworthy: the pyrefs share no code
with the Spark plans (xxh64 reimplemented from the public spec, folds as
explicit python loops), so agreement here is independent confirmation.
"""

import pytest
from pyspark.sql import functions as F

from datax_spark.oracle import pyref
from datax_spark.oracle.xxh64 import spark_xxhash64

SF_DIR = "/root/testdata/sf0.001"


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "a" * 100), (4, "héllo wörld"), (5, None)],
        "id long, s string",
    ).select(
        "id",
        "s",
        F.xxhash64("s").alias("h_str"),
        F.xxhash64("id").alias("h_long"),
        F.xxhash64("s", F.lit(7)).alias("h_chain"),
        F.xxhash64(F.lit(42), F.lit(3), F.lit(9)).alias("h_ints"),
    )
    for r in df.collect():
        assert r.h_str == spark_xxhash64(("str", r.s))
        assert r.h_long == spark_xxhash64(("long", r.id))
        assert r.h_chain == spark_xxhash64(("str", r.s), ("int", 7))
        assert r.h_ints == spark_xxhash64(("int", 42), ("int", 3), ("int", 9))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fingerprint_pyref_matches_engine(spark):
    from datax_spark.functions.text import fingerprint64

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _rows(docs.select("doc_id", fingerprint64(F.col("text")).alias("fp")))
    assert got == sorted(pyref.fingerprint_rows(SF_DIR))


def test_minhash_pyref_matches_engine(spark):
    from datax_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _rows(
        minhash_lsh_pairs(docs, "text", "doc_id", k_shingle=3, num_hashes=32,
                          bands=8, jaccard_threshold=0.5)
    )
    want = sorted(pyref.minhash_pairs_rows(SF_DIR))
    assert got == want
    assert len(got) > 0  # fixture must actually exercise the candidate path


def test_simhash_pyref_matches_engine(spark):
    from datax_spark.operators.dedup import simhash64

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _rows(simhash64(docs, "text", "doc_id"))
    assert got == sorted(pyref.simhash_rows(SF_DIR))


def test_ann_lsh_pyref_matches_engine(spark):
    from datax_spark.operators.similarity import cosine_topk_lsh

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = _rows(cosine_topk_lsh(emb, queries, dim=dim, k=10))
    assert got == sorted(pyref.ann_lsh_topk_rows(SF_DIR, k=10))


def test_media_pyref_matches_engine(spark):
    from datax_spark.operators.multimodal import extract_features, synthetic_media

    got = _rows(extract_features(synthetic_media(spark, 50)))
    assert got == sorted(pyref.media_features_rows(50))


def test_values_sql_roundtrip():
    duckdb = pytest.importorskip("duckdb")
    rows = [(1, "o'k", -3.5, None), (2, "b", 0.125, 7)]
    sql = pyref.values_sql(
        rows,
        [("id", "BIGINT"), ("s", "VARCHAR"), ("x", "DOUBLE"), ("n", "BIGINT")],
    )
    out = duckdb.sql(sql).fetchall()
    assert sorted(out) == [(1, "o'k", -3.5, None), (2, "b", 0.125, 7)]
    empty = pyref.values_sql([], [("id", "BIGINT")])
    assert duckdb.sql(empty).fetchall() == []
