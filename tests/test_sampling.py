"""Hash split / deterministic sampling (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.sampling import hash_split, sample_by_hash


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 5_000).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("text"))


def test_split_partitions_exhaustively(spark, docs):
    out = hash_split(docs, ["text"], {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5_000
    assert set(counts) == {"train", "val", "test"}
    # uniform hash: each split within a loose band of its fraction
    assert 0.75 * 5000 < counts["train"] < 0.85 * 5000
    assert 0.07 * 5000 < counts["val"] < 0.13 * 5000


def test_split_stable_under_repartition(spark, docs):
    a = hash_split(docs, ["text"], {"train": 0.9, "test": 0.1})
    b = hash_split(docs.repartition(17), ["text"], {"train": 0.9, "test": 0.1})
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_different_salt_different_assignment(spark, docs):
    a = hash_split(docs, ["text"], {"train": 0.5, "test": 0.5}, salt=1)
    b = hash_split(docs, ["text"], {"train": 0.5, "test": 0.5}, salt=2)
    moved = a.join(b.withColumnRenamed("split", "split2"), "text") \
             .filter(F.col("split") != F.col("split2")).count()
    assert moved > 1_000  # ~50% expected to move between independent halvings


def test_sample_is_subset_and_deterministic(spark, docs):
    s1 = sample_by_hash(docs, ["text"], 0.2)
    s2 = sample_by_hash(docs.repartition(5), ["text"], 0.2)
    n = s1.count()
    assert 0.15 * 5000 < n < 0.25 * 5000
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    # nested property: a smaller fraction with the same salt is a subset
    s_small = sample_by_hash(docs, ["text"], 0.05)
    assert s_small.exceptAll(s1).count() == 0


def test_validation_errors(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, ["text"], {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="at least two"):
        hash_split(docs, ["text"], {"a": 1.0})
    with pytest.raises(ValueError, match="fraction"):
        sample_by_hash(docs, ["text"], 1.5)


def test_no_shuffle_plan(spark, docs):
    plan = (hash_split(docs, ["text"], {"train": 0.8, "test": 0.2})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_stratified_fractions_and_nesting(spark):
    from datax_spark.operators.sampling import sample_stratified
    from pyspark.sql import functions as F

    df = spark.range(0, 6_000).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("text"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                     (F.col("id") % 3 + 1).cast("int")).alias("lang"))
    out = sample_stratified(df, ["text"], "lang",
                            {"en": 0.2, "de": 0.9}, default_fraction=1.0)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["fr"] == 2_000                    # default keeps all
    assert 0.15 * 2000 < counts["en"] < 0.25 * 2000
    assert 0.85 * 2000 < counts["de"] <= 2000
    # nesting: en@0.1 sample is a subset of en@0.2 (same salt)
    small = sample_stratified(df, ["text"], "lang", {"en": 0.1}, default_fraction=0.0)
    big = sample_stratified(df, ["text"], "lang", {"en": 0.2}, default_fraction=0.0)
    assert small.exceptAll(big).count() == 0
