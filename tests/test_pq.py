"""Product quantization ANN (operators/pq.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datax_spark.operators import pq

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))


def test_topk_matches_pure_python_reference(spark, emb, queries):
    from datax_spark.oracle import pyref

    got = sorted((r.qid, r.vec_id, r.adc_dist, r.rank)
                 for r in pq.pq_topk(emb, queries, k=10, m=8, n_codes=16).collect())
    want = sorted(pyref.pq_topk_rows(SF, k=10, m=8, n_codes=16))
    assert got == want


def test_encode_shape_and_range(spark, emb):
    books = pq.seed_codebooks(emb, m=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    rows = pq.encode(emb, books).collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes)


def test_trainer_deterministic_and_better_than_seeds(spark, emb, queries):
    b1 = pq.train_codebooks(emb, m=8, n_codes=16, sample_size=500, iters=8)
    b2 = pq.train_codebooks(emb.repartition(7), m=8, n_codes=16, sample_size=500, iters=8)
    assert np.array_equal(b1, b2)  # no RNG, repartition-stable

    seed_recall = pq.pq_recall(emb, queries, k=10, m=8, n_codes=16)
    trained_recall = pq.pq_recall(emb, queries, k=10, m=8, n_codes=16, codebooks=b1)
    # regression floors: measured 0.40 (seeds) / trained strictly better
    assert seed_recall >= 0.35
    assert trained_recall >= seed_recall


def test_dim_not_divisible_raises(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.seed_codebooks(emb, m=7, n_codes=16)
