"""Distributed k-means (operators/clustering.py): determinism across
partitionings, assignment sanity, empty-cluster and init guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datax_spark.operators.clustering import (
    farthest_point_init, kmeans_assign, kmeans_fit, kmeans_predict)


def _emb(spark, n=200, dim=8, parts=4):
    # three well-separated blobs, deterministic
    return spark.range(n).repartition(parts).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (F.col("id") % 3).cast("double") * 10.0
            + F.pmod(F.xxhash64("id", d), 1000).cast("double") / 1000.0,
        ).alias("embedding"),
    )


def test_fit_deterministic_across_partitionings(spark):
    df = _emb(spark, parts=4)
    C1 = kmeans_fit(df, k=3, iters=3)
    C2 = kmeans_fit(df.repartition(13), k=3, iters=3)
    assert np.array_equal(C1, C2)  # bit-identical, not just close

    a1 = sorted((r["vec_id"], r["cluster"])
                for r in kmeans_predict(df, C1).collect())
    a2 = sorted((r["vec_id"], r["cluster"])
                for r in kmeans_predict(df.repartition(7), C2).collect())
    assert a1 == a2

    # blobs separate: ids congruent mod 3 share a cluster
    by_mod = {}
    for vid, c in a1:
        by_mod.setdefault(vid % 3, set()).add(c)
    assert all(len(s) == 1 for s in by_mod.values())
    assert len({next(iter(s)) for s in by_mod.values()}) == 3


def test_empty_cluster_keeps_centroid_and_init_guard(spark):
    df = _emb(spark, n=30)
    # k larger than distinct blob count: some clusters may go empty —
    # fit must not crash and centroids stay finite
    C = kmeans_fit(df, k=8, iters=2)
    assert C.shape == (8, 8) and np.isfinite(C).all()

    with pytest.raises(ValueError, match="initialize"):
        kmeans_fit(_emb(spark, n=2), k=5, iters=1)


def test_assign_ties_lowest_index(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, embedding array<double>")
    C = np.array([[1.0, 0.0], [-1.0, 0.0]])  # equidistant
    assert kmeans_assign(df, C).collect()[0]["cluster"] == 0


def test_farthest_point_init_shape():
    X = np.array([[0.0], [10.0], [5.0], [0.1]])
    C = farthest_point_init(X, 3)
    assert C.tolist() == [[0.0], [10.0], [5.0]]


def test_null_vectors_dropped(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None), (3, [10.0, 10.0])],
        "vec_id long, embedding array<double>")
    C = kmeans_fit(df, k=2, iters=1, init_sample=10)
    got = kmeans_assign(df, C).collect()
    assert sorted(r["vec_id"] for r in got) == [1, 3]


def test_centroid_budget_guard(spark):
    """k*dim above the broadcast-closure ceiling fails loudly (not an
    executor/driver OOM): the centroid matrix rides the assign UDF
    closure and each Lloyd update collects k*dim sums."""
    from datax_spark.operators.clustering import MAX_CENTROID_COMPONENTS

    df = _emb(spark, n=30)
    too_many_k = MAX_CENTROID_COMPONENTS // 8 + 1  # dim=8 fixture
    with pytest.raises(ValueError, match="ceiling"):
        kmeans_fit(df, k=too_many_k, iters=1)
