"""Dedup + similarity operator behavior on crafted corpora."""

from pyspark.sql import functions as F

from datax_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash64,
)
from datax_spark.operators.similarity import cosine_topk, embedding_near_dup_pairs


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "the quick brown fox jumps over the very lazy dog"),      # near dup of 1
        (4, "completely different text about spark and data engines"),
        (5, "THE  QUICK   brown fox jumps over the lazy dog"),        # case/ws dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalizes_case_ws(spark):
    out = sorted(r["doc_id"] for r in exact_dedup(_docs(spark)).collect())
    assert out == [1, 3, 4]


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(_docs(spark), threshold=0.4).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.4 <= pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_candidates(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    assert not any(4 in p for p in pairs)
    kept = sorted(r["doc_id"] for r in minhash_lsh_dedup(_docs(spark), jaccard_threshold=0.5).collect())
    assert 1 in kept and 2 not in kept and 5 not in kept and 4 in kept


def test_simhash_identical_docs_equal_fp(spark):
    fps = {r["id"]: r["simhash"] for r in simhash64(_docs(spark)).collect()}
    assert fps[1] == fps[2] == fps[5]
    assert fps[1] != fps[4]
    assert all(v >= 0 for v in fps.values())  # 63-bit positive


def _vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_self_first(spark):
    emb = _vectors(spark)
    q = emb.filter("vec_id = 0").select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = cosine_topk(emb, q, k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 2]
    assert out[0]["cosine"] == 1.0 and out[0]["rank"] == 1


def test_embedding_near_dup(spark):
    pairs = [(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_pairs(_vectors(spark), dim=4, threshold=0.95).collect()]
    assert pairs == [(0, 1)]


def test_simhash_near_pairs_radius(spark):
    from datax_spark.operators.dedup import simhash_near_pairs

    docs = _docs(spark)
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             simhash_near_pairs(docs, radius=8).collect()}
    # exact dups hammering 0; near dup of 1 within radius; 4 unrelated
    assert pairs[(1, 2)] == 0 and pairs[(1, 5)] == 0 and pairs[(2, 5)] == 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 8
    assert not any(4 in p for p in pairs)


def test_highdim_dispatch_matches_hof_path(spark):
    """dim >= threshold routes through the numpy matmul path; results are
    byte-identical to the interpreted HOF fold (same rounding, same
    (cosine desc, id asc) order), including across Arrow-batch-local
    top-k pruning."""
    import random

    from datax_spark.operators.similarity import cosine_topk

    rng = random.Random(7)
    dim, n = 256, 300
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .repartition(8)
    q = emb.filter("vec_id < 4").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    hof = cosine_topk(emb, q, k=10)  # dim not passed → HOF path
    fast = cosine_topk(emb, q, k=10, dim=dim)  # ≥128 → numpy path
    a = sorted(map(tuple, hof.collect()))
    b = sorted(map(tuple, fast.collect()))
    assert a == b and len(a) == 40
    # below the threshold the plan must stay pure JVM (no Python workers)
    small = cosine_topk(emb, q, k=10, dim=64)
    assert "mapInPandas" not in small._jdf.queryExecution().executedPlan().toString()


def test_kmeans_trainer_separates_clusters_and_lifts_recall(spark):
    """Spherical k-means trainer: converges onto well-separated cluster
    directions, is partition-independent (decimal-sum means), and trained
    centroids never lose to the lowest-id seed centroids on IVF recall."""
    from datax_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        train_centroids_kmeans,
    )

    # 3 orthogonal clusters of 20 vectors with deterministic perturbation
    rows = []
    for c in range(3):
        for i in range(20):
            v = [0.0] * 6
            v[c * 2] = 1.0
            v[c * 2 + 1] = 0.05 * ((i * 7 + c) % 5)  # small in-cluster spread
            rows.append((c * 20 + i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    trained = train_centroids_kmeans(emb, n_centroids=3, iters=4)
    # partition-independence: same centroids from a different layout
    trained_rep = train_centroids_kmeans(emb.repartition(7), n_centroids=3, iters=4)
    a = {r["cid"]: [round(x, 9) for x in r["cvec"]] for r in trained.collect()}
    b = {r["cid"]: [round(x, 9) for x in r["cvec"]] for r in trained_rep.collect()}
    assert a == b
    # each trained centroid points at one distinct cluster axis
    axes = {max(range(6), key=lambda d: abs(v[d])) // 2 for v in a.values()}
    assert axes == {0, 1, 2}

    q = emb.filter("vec_id in (5, 25, 45)").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    exact = cosine_topk(emb, q, k=5).select("qid", "vec_id")

    def recall(cents):
        got = cosine_topk_ivf(emb, q, k=5, n_centroids=3, n_probe=1,
                              centroids=cents).select("qid", "vec_id")
        return got.join(exact, ["qid", "vec_id"]).count() / exact.count()

    r_trained = recall(trained)
    r_seed = recall(None)
    assert r_trained == 1.0  # 1 probe suffices once centroids = clusters
    assert r_trained >= r_seed


def test_repeated_span_stats_crafted(spark):
    """Hand-checkable ExactSubstr-lite: a 3-word span shared by two docs
    flags both; overlapping flagged spans merge in coverage; a unique
    doc reports zeros; n<k docs report zero spans."""
    from datax_spark.operators.dedup import repeated_span_stats

    docs = spark.createDataFrame(
        [
            # d0 and d1 share the run "a b c d" -> spans "a b c" and
            # "b c d" both repeat; coverage in each = positions of the
            # 4-word run
            (0, "a b c d x y z"),
            (1, "q a b c d r s"),
            (2, "u v w u2 v2 w2 u3"),   # all spans unique
            (3, "t1 t2"),               # fewer than k words
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           repeated_span_stats(docs, "text", "doc_id", k=3, min_count=2).collect()}
    assert out[0]["n_words"] == 7 and out[0]["n_dup_spans"] == 2
    assert out[0]["n_covered_words"] == 4          # "a b c d": merged overlap
    assert out[0]["dup_ratio"] == round(4 / 7, 6)
    assert out[1]["n_dup_spans"] == 2 and out[1]["n_covered_words"] == 4
    assert out[2]["n_dup_spans"] == 0 and out[2]["n_covered_words"] == 0
    assert out[2]["dup_ratio"] == 0.0
    assert out[3]["n_words"] == 2 and out[3]["n_dup_spans"] == 0

    # within-ONE-doc repetition also counts toward min_count
    solo = spark.createDataFrame([(9, "m n o p m n o")], "doc_id long, text string")
    r = repeated_span_stats(solo, "text", "doc_id", k=3, min_count=2).collect()[0]
    assert r["n_dup_spans"] == 2      # "m n o" at 0 and at 4
    assert r["n_covered_words"] == 6  # positions 0-2 and 4-6


def test_incremental_dedup_vs_corpus_index(spark):
    """Dedup-at-ingest: a new batch probes the EXISTING corpus index —
    corpus dups drop the new doc, within-batch dups drop the larger id,
    unique docs survive. Also pins that the new side broadcasts (the
    corpus index must never shuffle at 100 TB batch≪corpus)."""
    from datax_spark.operators.dedup import (
        minhash_band_index,
        minhash_incremental_dedup,
        minhash_incremental_pairs,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight again"),
            (2, "completely different text about spark and data engines"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight again"),  # corpus dup
            (11, "an entirely novel document about glaciers and moraines ok"),  # unique
            (12, "fresh words by the river delta sediment carried downstream"), # unique, dup'd by 13
            (13, "fresh words by the river delta sediment carried downstream"),
        ],
        "doc_id long, text string",
    )
    idx = minhash_band_index(corpus, "text", "doc_id", num_hashes=32, bands=8)
    pairs = minhash_incremental_pairs(
        new, idx, "text", "doc_id", num_hashes=32, bands=8, jaccard_threshold=0.5
    )
    got = {(r["new_id"], r["corpus_id"]): r["jaccard_est"] for r in pairs.collect()}
    assert got[(10, 1)] == 1.0
    assert all(n != 11 and n != 12 for n, _ in got)

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    kept = sorted(
        r["doc_id"]
        for r in minhash_incremental_dedup(
            new, idx, "text", "doc_id", num_hashes=32, bands=8, jaccard_threshold=0.5
        ).collect()
    )
    assert kept == [11, 12]  # 10 corpus-matched; 13 within-batch larger id

    # broadcast_new=False (the documented backfill setting) must not
    # leak into the within-batch self-join's kwargs — regression for a
    # TypeError when the kwarg was forwarded to minhash_lsh_pairs
    kept_nb = sorted(
        r["doc_id"]
        for r in minhash_incremental_dedup(
            new, idx, "text", "doc_id", num_hashes=32, bands=8,
            jaccard_threshold=0.5, broadcast_new=False,
        ).collect()
    )
    assert kept_nb == kept


def test_incremental_pairs_threshold_filters(spark):
    """Band-colliding but low-estimate pairs are filtered by threshold."""
    from datax_spark.operators.dedup import minhash_band_index, minhash_incremental_pairs

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(20, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    idx = minhash_band_index(corpus, "text", "doc_id", num_hashes=32, bands=8)
    none = minhash_incremental_pairs(
        new, idx, "text", "doc_id", num_hashes=32, bands=8, jaccard_threshold=1.1
    )
    assert none.count() == 0
