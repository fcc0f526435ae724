"""Benchmark decontamination (operators/decontaminate.py)."""

import pytest
from pyspark.sql import Row, functions as F

from datax_spark.operators.decontaminate import flag_ngram_contamination


@pytest.fixture(scope="module")
def crafted(spark):
    corpus = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="completely unrelated words nothing shared here at all"),
        Row(doc_id=3, text="prefix noise quick brown fox jumps suffix noise"),
        Row(doc_id=4, text="short text"),  # fewer words than n
    ])
    reference = spark.createDataFrame([
        Row(doc_id=100, text="benchmark says quick brown fox jumps high"),
        Row(doc_id=101, text="short text"),
    ])
    return corpus, reference


def test_flags_exact_ngram_overlap(spark, crafted):
    corpus, reference = crafted
    got = {r.doc_id: r for r in
           flag_ngram_contamination(corpus, reference, n=4).collect()}
    # docs 1 and 3 share the 4-gram "quick brown fox jumps"
    assert set(got) == {1, 3, 4}
    assert got[1].example_gram == "quick brown fox jumps"
    assert got[3].n_matched_grams == 1
    # doc 4 matches the reference's short doc via the <n whole-text shingle
    assert got[4].example_gram == "short text"


def test_clean_corpus_empty_result(spark, crafted):
    corpus, reference = crafted
    clean = corpus.filter(F.col("doc_id") == 2)
    assert flag_ngram_contamination(clean, reference, n=4).count() == 0


def test_scrub_via_anti_join(spark, crafted):
    corpus, reference = crafted
    flagged = flag_ngram_contamination(corpus, reference, n=4).select("doc_id")
    scrubbed = corpus.join(flagged, "doc_id", "left_anti")
    assert {r.doc_id for r in scrubbed.collect()} == {2}


def test_broadcast_plan(spark, crafted):
    corpus, reference = crafted
    plan = (flag_ngram_contamination(corpus, reference, n=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
