"""Deduplication operators for web-scale corpora.

DataX itself has no dedup (it delegates to sink REPLACE/ON-DUP-KEY,
SURVEY §2.8); these are the training-data-pipeline operators the engine
adds as first-class citizens. All are expressed as DataFrame plans —
shuffles only on the grouping keys, map-side combines everywhere:

- exact_dedup: hash groupBy on a content digest — one shuffle of
  (digest, id), winner = min id (deterministic).
- minhash_lsh_dedup: word-shingles → K minhashes → B bands → candidate
  pairs via band-bucket self-join (the shuffle is on (band, signature),
  so only colliding docs meet) → verified Jaccard ≥ threshold →
  connected-to-representative collapse (min doc id per cluster seed).
- simhash64: 64-bit SimHash over token hashes; near-dups = equal
  fingerprints (or banded Hamming buckets for radius>0).
- ngram_jaccard_pairs: exact pairwise Jaccard over k-shingles for
  bounded candidate sets (the verification oracle for the LSH path).
- embedding near-dup lives in operators/similarity.py (cosine ≥ t).

At 100 TB: every self-join here is band/bucket-partitioned so candidate
generation never does a cartesian; AQE handles band skew (stop-word-only
docs collapsing into one band bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datax_spark.functions.text import normalize_ws, shingles
from datax_spark.operators.util import rebalance_for_cpu


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per exact normalized-text duplicate class."""
    digest = F.md5(F.encode(F.lower(normalize_ws(F.col(text_col))), "UTF-8"))
    return (
        df.withColumn("_digest", digest)
        .groupBy("_digest")
        .agg(F.min(F.col(id_col)).alias(id_col))
        .drop("_digest")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k_shingle: int = 3, num_hashes: int = 32
) -> DataFrame:
    """(id, array<minhash>) — each minhash_i = min over shingles of
    xxhash64(shingle, i). Pure JVM expressions; one pass, no shuffle.

    Each shingle string is hashed ONCE (O(bytes)); the ``num_hashes``
    permutations re-hash only the resulting 8-byte long (xxhash64 long
    specialization — O(1) per element), so signature cost is
    O(bytes + num_hashes·n_shingles), not O(num_hashes·bytes).

    NB: permutation lambdas MUST take a single argument — a two-param
    lambda makes ``F.transform`` bind the second to the array index,
    silently replacing the permutation seed (a bug this engine shipped
    in round 1: all 32 minhashes collapsed to one value)."""
    base = F.transform(shingles(F.col(text_col), k_shingle), lambda s: F.xxhash64(s))

    def _perm(i: int):
        return lambda h: F.xxhash64(h, F.lit(i))

    mins = F.array(
        *[F.array_min(F.transform(F.col("_base"), _perm(i))) for i in range(num_hashes)]
    )
    return (
        rebalance_for_cpu(df)
        .select(F.col(id_col).alias("id"), base.alias("_base"))
        .select("id", mins.alias("sig"))
    )


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """(id, sig, band, band_sig) — the persistable LSH index of a corpus.

    One row per (doc, band); ``band_sig`` = xxhash64 over that band's
    minhash slice. This is the table a 100 TB pipeline stores ONCE
    (bucketed by (band, band_sig) in the lake) so that each new ingest
    batch dedups against the corpus without ever re-pairing the corpus
    with itself — see :func:`minhash_incremental_pairs`.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, k_shingle, num_hashes)
    return sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1).cast("string")
                                                   for r in range(rows)]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_sig"),
    )


def minhash_incremental_pairs(
    new_df: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.8,
    broadcast_new: bool = True,
) -> DataFrame:
    """(new_id, corpus_id, jaccard_est) — collide a NEW ingest batch
    against an EXISTING corpus LSH index (:func:`minhash_band_index`
    output, typically read back from the lake).

    The 100 TB shape: the corpus index is huge but the per-batch side is
    small, so with ``broadcast_new=True`` (default) the batch's banded
    signatures broadcast and the corpus index NEVER shuffles — the join
    is a map-side probe over the index scan, cost ∝ batch size, not
    corpus size. Set ``broadcast_new=False`` for backfill-sized batches
    and let AQE pick the strategy. ``num_hashes``/``bands``/``k_shingle``
    must match the parameters the index was built with.
    """
    new_idx = minhash_band_index(new_df, text_col, id_col, k_shingle, num_hashes, bands)
    a = new_idx.select(
        F.col("id").alias("new_id"), F.col("sig").alias("sig_a"), "band", "band_sig"
    )
    if broadcast_new:
        a = F.broadcast(a)
    b = corpus_index.select(
        F.col("id").alias("corpus_id"), F.col("sig").alias("sig_b"), "band", "band_sig"
    )
    return (
        a.join(b, ["band", "band_sig"])
        .withColumn(
            "jaccard_est",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
            / F.lit(num_hashes),
        )
        .select("new_id", "corpus_id", "jaccard_est")
        .dropDuplicates(["new_id", "corpus_id"])
        .filter(F.col("jaccard_est") >= jaccard_threshold)
    )


def minhash_incremental_dedup(
    new_df: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Survivors of a new ingest batch after near-dup collapse against
    (a) the existing corpus and (b) the batch itself.

    A new doc is dropped if it has any corpus match at
    ``jaccard_threshold``, or if it is the larger id of a within-batch
    candidate pair (same single-hop rule as :func:`minhash_lsh_dedup`).
    This is dedup-at-ingest: cost ∝ batch, never O(corpus²).
    """
    pairs_c = minhash_incremental_pairs(new_df, corpus_index, text_col, id_col, **kw)
    dropped_c = pairs_c.select(F.col("new_id").alias("id"))
    # broadcast_new steers only the corpus probe; the within-batch
    # self-join has no broadcast side and doesn't accept the kwarg
    kw.pop("broadcast_new", None)
    pairs_n = minhash_lsh_pairs(new_df, text_col, id_col, **kw)
    dropped_n = pairs_n.select(F.col("id_b").alias("id"))
    dropped = dropped_c.union(dropped_n).distinct()
    return new_df.join(dropped, new_df[id_col] == dropped["id"], "left_anti")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) with estimated Jaccard.

    rows_per_band = num_hashes // bands; docs sharing any band signature
    become candidates; estimate = fraction of matching minhashes. The
    band join shuffles only (band_idx, band_sig) keys.
    """
    banded = minhash_band_index(df, text_col, id_col, k_shingle, num_hashes, bands)
    a = banded.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "band_sig")
    b = banded.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "band_sig")
    # jaccard_est is computed BEFORE the pair-dedup so the 32×8B signature
    # arrays are projected away prior to the dropDuplicates shuffle — the
    # exchange carries (id_a, id_b, est) only, not 512B of sigs per row.
    est = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard_est",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
            / F.lit(num_hashes),
        )
        .select("id_a", "id_b", "jaccard_est")
        .dropDuplicates(["id_a", "id_b"])
    )
    return est.filter(F.col("jaccard_est") >= jaccard_threshold)


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Drop near-duplicates: each doc maps to min(id) among its near-dup
    neighbors (single-hop representative — the standard web-dedup
    approximation; ``operators/components.py::component_dedup`` is the
    full-connected-components upgrade when transitive chains matter)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kw)
    rep = (
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("rep"))
        .groupBy("id")
        .agg(F.min("rep").alias("rep"))
    )
    return (
        df.join(rep, df[id_col] == rep["id"], "left_anti")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard over distinct k-shingles via shingle-inverted
    index self-join: |A∩B| from co-occurring shingles, |A∪B| = |A|+|B|−∩.
    Shuffle key = shingle (inverted-index join), never a cartesian.

    ``max_df`` caps posting-list length: a shingle shared by D documents
    contributes D² candidate pairs, so one stop-shingle ("of the …") in
    10^6 docs is a 10^12-pair bucket — the self-join's quadratic hot
    spot. Dropping shingles with document frequency > max_df before the
    join is the standard inverted-index guard; intersections then
    UNDERCOUNT by the dropped shingles, making the capped Jaccard a
    lower bound (near-dup pairs share mostly rare shingles, so recall
    loss is small). ``None`` keeps the exact semantics — at web scale
    ALWAYS set it (e.g. 1000)."""
    ex = (
        rebalance_for_cpu(df)
        .select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles(F.col(text_col), k_shingle))).alias("sh"))
    )
    sizes = ex.groupBy("id").agg(F.count("*").alias("n"))
    if max_df is not None:
        rare = (
            ex.groupBy("sh").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("sh")
        )
        ex = ex.join(rare, "sh")  # shuffle key = shingle, same as the join
    a = ex.select(F.col("id").alias("id_a"), "sh")
    b = ex.select(F.col("id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: sign-sum of token-hash bits, JVM-side only.

    For each bit i: +1 if bit set else -1, summed over tokens; bit in the
    fingerprint = sum > 0. Uses an aggregate over exploded tokens — one
    shuffle on id with map-side partial sums.
    """
    words = F.split(F.lower(normalize_ws(F.col(text_col))), r"\s+")
    tok = rebalance_for_cpu(df).select(F.col(id_col).alias("id"), F.explode(words).alias("w"))
    tok = tok.withColumn("h", F.xxhash64("w"))
    bit_sums = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(63)  # bit 63 = sign bit; skip to stay in positive long
        ]
    )
    fp = bit_sums.select(
        "id",
        sum(
            [F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")) for i in range(63)],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return fp


def simhash_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of docs with identical simhash (Hamming radius 0)."""
    fp = simhash64(df, text_col, id_col)
    return (
        fp.groupBy("simhash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    radius: int = 3,
    bands: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs with Hamming(simhash_a, simhash_b) ≤ radius.

    Pigeonhole banding (the classic Manku/Jain/Sarma web-dedup scheme):
    split the 63 usable bits into ``bands`` (default radius+1)
    contiguous bands — two fingerprints within the radius must agree
    EXACTLY on at least one band, so candidates come from a band-value
    self-join (shuffle key = (band, band_bits), never a cartesian) and
    are verified with an exact popcount on the XOR. bit_count is a JVM
    intrinsic; the verify step is codegen'd."""
    nb = bands if bands is not None else radius + 1
    width = 63 // nb  # band b covers bits [b*width, (b+1)*width) (tail bits
    # land in the last band)
    fp = simhash64(df, text_col, id_col)

    def band_bits(b: int):
        lo = b * width
        hi = 63 if b == nb - 1 else (b + 1) * width
        mask = ((1 << (hi - lo)) - 1) << lo
        return F.col("simhash").bitwiseAND(F.lit(mask).cast("long"))

    banded = fp.select(
        "id", "simhash",
        F.posexplode(F.array(*[band_bits(b) for b in range(nb)])).alias("band", "bits"),
    )
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "band", "bits")
    b2 = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "band", "bits")
    return (
        a.join(b2, ["band", "bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= radius)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


def repeated_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document repeated-span statistics — the ExactSubstr dedup
    signal (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): a k-word span whose hash occurs >=
    ``min_count`` times CORPUS-WIDE (including repeats inside one
    document) marks memorization-prone duplicated text. Output per doc:

        (id, n_words, n_dup_spans, n_covered_words, dup_ratio)

    where n_covered_words counts distinct word positions lying under any
    flagged span (overlapping spans merge naturally via the distinct)
    and dup_ratio = covered / n_words — the number a curation pipeline
    thresholds on to drop or trim documents.

    Plan (all JVM expressions): one rolling-hash projection (the SAME
    ``shingles`` construction MinHash uses — one shared shingle
    definition for the whole dedup family and its oracles) → posexplode
    (span-hash rows carry (id, pos, 8-byte hash) — never text) → corpus
    occurrence count as a WINDOW over the hash (one exchange, and the
    span pass scans the corpus exactly once — a groupBy+semi-join pair
    would re-run the tokenize+hash projection per branch) → position
    explode of FLAGGED spans only (×k blowup proportional to duplicated
    volume, not corpus volume) → two doc aggregates joined to a narrow
    (id, n_words) projection. Suffix-array ExactSubstr finds
    arbitrary-length repeats; the fixed-k hashed variant is the standard
    scalable approximation (a repeat of length L >= k is covered by its
    L-k+1 spans). Hot-span skew sits in the window partition exactly as
    it would in the join probe; AQE covers it.
    """
    from pyspark.sql import Window

    t = F.coalesce(F.col(text_col), F.lit(""))
    norm = F.lower(normalize_ws(t))
    # empty/null-safe word count (split("") yields [""], size 1 — the
    # token_count guard, not a phantom word)
    n = F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, r"\s+")))
    grams = F.when(
        n >= k,
        F.transform(shingles(t, k), lambda s: F.xxhash64(s)),
    ).otherwise(F.array().cast("array<bigint>"))
    base = df.select(F.col(id_col).alias("id"), n.alias("n_words"), grams.alias("_g"))
    g = base.select("id", F.posexplode("_g").alias("pos", "gh"))
    flagged = (
        g.withColumn("_c", F.count("*").over(Window.partitionBy("gh")))
        .filter(F.col("_c") >= min_count)
        .drop("_c")
    )
    n_dup = flagged.groupBy("id").agg(F.count("*").alias("n_dup_spans"))
    covered = (
        flagged.select("id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("wp"))
        .distinct()
        .groupBy("id")
        .agg(F.count("*").alias("n_covered_words"))
    )
    return (
        base.select("id", "n_words")
        .join(n_dup, "id", "left")
        .join(covered, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_words",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("n_covered_words", F.lit(0)).alias("n_covered_words"),
            F.round(
                F.coalesce("n_covered_words", F.lit(0)) / F.greatest(F.col("n_words"), F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )
