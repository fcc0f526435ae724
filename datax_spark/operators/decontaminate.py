"""Benchmark decontamination: flag training documents that share long
n-grams with an evaluation/reference set.

The standard pre-training hygiene step (GPT-3 appendix C, PaLM §C,
FineWeb): a document that contains any ≥n-gram from a benchmark's
prompts/answers leaks eval data into training, so it must be dropped or
scrubbed. The reference side (benchmarks) is small — thousands of
documents — while the training side is the full corpus, which fixes the
plan shape:

    reference → explode n-grams → distinct → BROADCAST
    corpus    → explode n-grams → map-side semi-join (no shuffle of
                corpus text) → per-doc aggregate of matched grams

The only exchange carries (doc_id, matched-gram) pairs for CONTAMINATED
documents — at healthy contamination rates (≪1%) that is a trickle, so
cost ≈ one corpus scan regardless of corpus size. Gram identity uses
the whitespace-normalized shingle strings from ``functions.text`` (the
same normalization the dedup family uses), so the operator is exact and
SQL-oracle-checkable — swap in xxhash64 gram hashes at 100 TB to shrink
the broadcast (identity loss is a 2^-64 collision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datax_spark.functions.text import shingles


def reference_ngrams(reference: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct n-gram strings of the reference set (one column ``gram``)."""
    return (reference
            .select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
            .distinct())


def flag_ngram_contamination(
    corpus: DataFrame,
    reference: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
) -> DataFrame:
    """(id, n_matched_grams, example_gram) for every contaminated corpus
    document — ``example_gram`` (the lexicographically first match) makes
    audits actionable. Clean documents are absent (anti-join the result
    to scrub the corpus)."""
    grams = reference_ngrams(reference, ref_text_col or text_col, n)
    doc_grams = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram"))
    hits = doc_grams.join(F.broadcast(grams), "gram")
    return hits.groupBy(id_col).agg(
        F.count_distinct("gram").alias("n_matched_grams"),
        F.min("gram").alias("example_gram"),
    )
