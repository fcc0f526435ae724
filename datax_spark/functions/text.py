"""Text-analysis operators for large-scale training-data pipelines.

All hot-path functions are built-in ``pyspark.sql.functions`` expressions
(JVM-side, whole-stage-codegen'd) so they run at scan speed over 100 TB;
nothing here drops to Python per row. Each returns a Column, composable
into any projection.

- token_count: whitespace tokenization (split on \\s+)
- word-punct/BPE-ish token count: regex token classes
- quality_score: length / alpha-ratio / stopword-ratio composite
- lang_id: stopword-hit heuristic over a small per-language lexicon
- fingerprint: deterministic 64-bit content fingerprint (xxhash64 over
  normalized text) + shingle-based rolling fingerprints for near-dup use
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny per-language stopword lexicons (deterministic, public knowledge)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "una", "del", "para", "por"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "他", "这", "们"],
}


def normalize_ws(col) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def token_count(col) -> Column:
    """Whitespace token count; empty/null-safe (0 for empty)."""
    t = normalize_ws(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("bigint")


def wordpunct_token_count(col) -> Column:
    """BPE-ish pre-tokenizer count: word pieces OR single non-space symbols
    (the GPT-2-style pre-split classes, regex-only)."""
    toks = F.regexp_extract_all(col, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(toks).cast("bigint")


def alpha_ratio(col) -> Column:
    no_alpha = F.regexp_replace(col, r"[A-Za-z]", "")
    return F.when(F.length(col) > 0,
                  (F.length(col) - F.length(no_alpha)) / F.length(col)).otherwise(F.lit(0.0))


def punct_ratio(col) -> Column:
    no_punct = F.regexp_replace(col, r"[.,;:!?'\"()\[\]{}\-]", "")
    return F.when(F.length(col) > 0,
                  (F.length(col) - F.length(no_punct)) / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col, lang: str = "en") -> Column:
    """Per-token stopword hit ratio (duplicates counted)."""
    words = F.split(F.lower(normalize_ws(col)), r"\s+")
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    dup_hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(words) > 0, dup_hits / F.size(words)).otherwise(F.lit(0.0))


def quality_score(col) -> Column:
    """Composite document-quality score in [0,1]: favors mid-length docs
    with high alpha ratio, some stopwords, low punctuation excess.
    Deterministic arithmetic only.

    Rounding is ``floor(x*1e4 + 0.5)/1e4`` rather than ``F.round``:
    Spark's ROUND converts the double through its SHORTEST decimal
    representation (BigDecimal) before rounding while other engines
    round the raw binary double, so scores one ULP from a .xxxx5
    boundary disagree across engines (first observed at sf1: 0.4317 vs
    0.4318 on 3 of 50k docs). The floor form is pure IEEE-754 ops —
    bit-identical in any engine that evaluates the same expression."""
    n_tok = token_count(col)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    raw = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * alpha_ratio(col)
        + F.lit(0.2) * F.least(stopword_ratio(col) * 4, F.lit(1.0))
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0)))
    )
    return F.floor(raw * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def lang_id(col) -> Column:
    """Stopword-hit language id over the fixed lexicons; ties break by
    fixed language order (en, de, fr, es, zh); no hits → 'und'."""
    words = F.split(F.lower(normalize_ws(col)), r"\s+")

    def _hit(sw):
        return lambda w: F.array_contains(sw, w)

    scores = []
    for lg in ["en", "de", "fr", "es", "zh"]:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lg]])
        scores.append(
            F.struct(
                F.size(F.filter(words, _hit(sw))).alias("hits"),
                F.lit({"en": 4, "de": 3, "fr": 2, "es": 1, "zh": 0}[lg]).alias("prio"),
                F.lit(lg).alias("lang"),
            )
        )
    best = F.greatest(*scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint64(col) -> Column:
    """Deterministic 64-bit document fingerprint over normalized text."""
    return F.xxhash64(F.lower(normalize_ws(col)))


def shingles(col, k: int = 3) -> Column:
    """Array of k-word shingle strings (for Jaccard / MinHash).

    The words array is evaluated ONCE and bound as a lambda variable
    (wrap-in-single-element-array + ``transform`` trick, unwrapped with
    ``element_at``): higher-order-function lambda bodies run interpreted
    with NO common-subexpression elimination, so referencing the
    split+lower+normalize expression directly inside the per-position
    lambda re-tokenizes the WHOLE document for every shingle position —
    O(positions × bytes) regexp work. Measured r6 on the sf0.1 corpus:
    the span-hash projection alone dropped ~10x, and every shingle
    consumer (minhash/ngram/repeated-span) inherits it. Same expressions
    on the same bound values → byte-identical shingle strings (pinned by
    the unchanged minhash/ngram/span oracles)."""
    words = F.split(F.lower(normalize_ws(col)), r"\s+")

    def _shingle_arr(w):
        n = F.size(w)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        return F.when(n >= k,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)))
        ).otherwise(F.array(F.concat_ws(" ", w)))

    return F.element_at(F.transform(F.array(words), _shingle_arr), 1)


def repetition_signals(df, text_col: str, id_col: str):
    """Gopher-style repetition quality signals per document — the
    standard web-corpus filters for templated/spammy pages (Rae et al.
    2021 §A1.1): distinct-word ratio, top-word dominance, top-bigram
    dominance.

    Plan: the array-level signals (n_words, distinct_ratio) are pure
    codegen projections; the dominance signals explode words/bigrams and
    aggregate twice — first keyed (doc, gram) with map-side partial
    counts (hot grams inside one doc combine before the exchange), then
    keyed doc. Shuffle rows carry only (id, gram hash-sized strings) —
    never the document text.
    """
    # TWO corpus passes, one join: every word-level signal (n_words,
    # distinct ratio, top-word dominance) derives from the single
    # (doc, word)-count aggregate — sum(c) = n_words, count(*) = distinct
    # words, max(c) = dominant count — so no separate array-level pass
    # and no second join. Bigrams genuinely need their own explode.
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    wc = (df.select(F.col(id_col), F.explode(words).alias("_g"))
          .groupBy(id_col, "_g").agg(F.count("*").alias("_c")))
    wstats = wc.groupBy(id_col).agg(
        F.sum("_c").alias("_n"), F.count("*").alias("_nd"), F.max("_c").alias("_mx"))

    bigrams = F.expr(
        "filter(transform(sequence(0, greatest(size(_ws) - 2, 0)),"
        "  i -> IF(i < size(_ws) - 1, concat(_ws[i], ' ', _ws[i+1]), NULL)), x -> x IS NOT NULL)")
    bc = (df.select(F.col(id_col), words.alias("_ws"))
          .select(id_col, F.explode(bigrams).alias("_g"))
          .groupBy(id_col, "_g").agg(F.count("*").alias("_c")))
    bstats = bc.groupBy(id_col).agg(F.max("_c").alias("_bmx"), F.sum("_c").alias("_btot"))

    return (
        wstats.join(bstats, id_col, "left")  # single-word docs have no bigrams
        .select(
            F.col(id_col),
            F.col("_n").cast("int").alias("n_words"),
            F.round(F.col("_nd").cast("double") / F.col("_n"), 6).alias("distinct_ratio"),
            F.round(F.col("_mx").cast("double") / F.col("_n"), 6).alias("top_word_ratio"),
            F.round(F.col("_bmx").cast("double") / F.col("_btot"), 6).alias("top_bigram_ratio"),
        )
    )


def unigram_logprob(df, text_col: str, id_col: str):
    """Corpus-level unigram language-model score per document: mean
    natural-log probability of the document's words under the corpus'
    own Laplace-smoothed unigram distribution — the classic cheap
    outlier/quality signal (gibberish and boilerplate score low against
    the corpus it sits in; CCNet uses the same idea with a trained LM).

    Two aggregates: a corpus-wide word-count (one shuffle keyed by word,
    map-side combine), then a per-doc aggregate over the word→logprob
    join. The per-term logprobs are cast to DECIMAL(20,12) before the
    per-doc sum so the total is exact and PARTITION-ORDER-INDEPENDENT
    (float sums reorder under repartitioning; decimal sums don't) — the
    same discipline as corpus_curation's decimal averages. The corpus
    totals (token count, vocabulary size) are one driver action over an
    already-aggregated single row.
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda w: w != "")).alias("_w"),
    )
    vocab = words.groupBy("_w").agg(F.count("*").alias("_c"))
    totals = vocab.agg(F.sum("_c").alias("tot"), F.count("*").alias("v")).first()
    denom = float(totals["tot"] + totals["v"])
    scored_vocab = vocab.withColumn(
        "_lp", F.log((F.col("_c") + 1) / F.lit(denom)).cast("decimal(20,12)"))
    return (
        words.join(scored_vocab.select("_w", "_lp"), "_w")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_words"),
             F.round((F.sum("_lp").cast("double") / F.count("*")), 6).alias("avg_logprob"))
    )


# ------------------------------------------------------------------ PII

# Conservative, engine-portable patterns (valid in both Java regex and
# RE2): the point is redaction-before-training, where false negatives
# are worse than over-redaction. All three are codegen projections.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_count(col, kind: str) -> Column:
    """Number of matches of one PII pattern (pre-scrub audit metric)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind]))


def pii_scrub(col) -> Column:
    """Redact emails / phone-like / IPv4-like substrings with typed
    placeholders. Email runs first so its digit runs can't be half-eaten
    by the phone pattern. Zero-shuffle scan-side projection — the shape
    a 100 TB redaction pass must have."""
    out = F.regexp_replace(col, PII_PATTERNS["email"], "<EMAIL>")
    out = F.regexp_replace(out, PII_PATTERNS["phone"], "<PHONE>")
    out = F.regexp_replace(out, PII_PATTERNS["ipv4"], "<IP>")
    return out


def paragraph_dedup_stats(df, text_col: str, id_col: str,
                          delim: str = " the ", max_df: int = 5):
    """Corpus-level paragraph (line-level) dedup statistics — the CCNet /
    RefinedWeb step that drops boilerplate paragraphs repeated across
    many pages. Documents are split on ``delim``; a paragraph's document
    frequency is counted corpus-wide; per document we report how many
    paragraphs survive a ``df <= max_df`` filter and the surviving
    character volume.

    Plan: explode → one exchange keyed by paragraph (countDistinct doc)
    → join back on paragraph → per-doc aggregate. The join key is the
    paragraph STRING here because the driver's oracle must reproduce it
    in SQL; at 100 TB key on xxhash64(paragraph) instead so the shuffle
    carries 8-byte keys (collision-safe for dedup purposes), exactly as
    operators/dedup.py does for exact dedup.
    """
    import re as _re

    paras = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), _re.escape(delim))).alias("_p"))
        .filter(F.col("_p") != "")
    )
    dfc = paras.groupBy("_p").agg(F.count_distinct(F.col(id_col)).alias("_df"))
    return (
        paras.join(dfc, "_p")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.when(F.col("_df") > max_df, 1).otherwise(0)).alias("n_dup_paras"),
            F.sum(F.when(F.col("_df") <= max_df, F.length("_p")).otherwise(F.lit(0).cast("int"))).alias("kept_chars"),
        )
    )


def normalize_unicode(col, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column.

    Web text mixes precomposed and decomposed codepoint sequences for
    the SAME rendered text ("é" as U+00E9 vs "e"+U+0301); every dedup
    key, fingerprint, or tokenizer upstream of training data must see
    ONE spelling, so corpora normalize (typically NFC) before hashing.

    Spark has no built-in normalizer, so this is the documented
    vectorized-Arrow exception to this module's JVM-only rule: python's
    ``unicodedata`` (UCD) via a pandas UDF — one ``str.normalize`` call
    per Arrow batch, no per-row python loop. Zero-shuffle projection;
    safe at scan scale, ~GB/s per core.

    Oracle parity: DuckDB ``nfc_normalize`` (same UCD algorithm) — see
    ``doc_nfc_normalize`` in ``__spark_entry__``.
    """
    from pyspark.sql import types as T

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def _norm(s):
        # pandas .str.normalize delegates to unicodedata.normalize
        return s.str.normalize(form)

    # functionType-style pandas_udf (no type hints: pandas is imported
    # lazily here, so 'pd.Series' annotations would not resolve)
    norm_udf = F.pandas_udf(_norm, T.StringType())
    return norm_udf(col)
