"""dx_* transformer parity against the reference's documented examples
(transformer/doc/transformer.md:12-71; FIXTURES.md §5 canonical record)."""

import pytest
from pyspark.sql import functions as F

from datax_spark.functions.transformers import (
    apply_chain,
    dx_digest,
    dx_filter,
    dx_pad,
    dx_replace,
    dx_substr,
    register_transformer,
)


@pytest.fixture(scope="module")
def smoke(spark):
    # the reference's canonical 5-type record
    return spark.createDataFrame([("DataX", 1724154616370, True)], "c0 string, c1 long, c3 boolean")


def _one(spark, col_expr):
    return spark.range(1).select(col_expr.alias("v")).first()["v"]


def test_dx_substr(spark):
    df = spark.createDataFrame([("DataX",), (None,)], "s string")
    out = [r["v"] for r in df.select(dx_substr(F.col("s"), 1, 3).alias("v")).collect()]
    assert out == ["ata", None]
    # clamps to end
    assert _one(spark, dx_substr(F.lit("abc"), 1, 99)) == "bc"


def test_dx_pad(spark):
    assert _one(spark, dx_pad(F.lit("abc"), "l", 6, "*")) == "***abc"
    assert _one(spark, dx_pad(F.lit("abc"), "r", 6, "*")) == "abc***"
    # longer input truncated to target length (reference behavior)
    assert _one(spark, dx_pad(F.lit("abcdefgh"), "l", 4, "*")) == "abcd"
    # null treated as empty
    assert _one(spark, dx_pad(F.lit(None).cast("string"), "l", 3, "*")) == "***"


def test_dx_replace(spark):
    # splice [start, start+length) with replacement
    assert _one(spark, dx_replace(F.lit("DataX"), 1, 2, "__")) == "D__aX"
    assert _one(spark, dx_replace(F.lit("DataX"), 0, 5, "z")) == "z"
    assert _one(spark, dx_replace(F.lit(None).cast("string"), 0, 1, "z")) is None


def test_dx_filter_drop_polarity(spark):
    df = spark.createDataFrame([(1, "a"), (5, "b"), (None, "c")], "n int, s string")
    # match ⇒ DROP: n > 3 drops the 5
    kept = dx_filter(df, "n", ">", 3).select("s").rdd.map(lambda r: r[0]).collect()
    assert sorted(kept) == ["a", "c"]  # null never matches >
    # like is full-match regex
    df2 = spark.createDataFrame([("DataX",), ("DataY",), ("X",)], "s string")
    kept2 = [r["s"] for r in dx_filter(df2, "s", "like", "Data.*").collect()]
    assert kept2 == ["X"]


def test_dx_digest(spark):
    import hashlib

    v = _one(spark, dx_digest(F.lit("DataX"), "md5", "toLowerCase"))
    assert v == hashlib.md5(b"DataX").hexdigest()
    v2 = _one(spark, dx_digest(F.lit(None).cast("string"), "sha1", "toUpperCase"))
    assert v2 == hashlib.sha1(b"").hexdigest().upper()


def test_apply_chain_and_registry(spark, smoke):
    chain = [
        {"name": "dx_substr", "column": "c0", "paras": [0, 4]},
        {"name": "dx_pad", "column": "c0", "paras": ["r", 6, "_"]},
        {"name": "dx_filter", "column": "c1", "paras": ["<", 0]},
    ]
    out = apply_chain(smoke, chain).collect()
    assert len(out) == 1
    assert out[0]["c0"] == "Data__"

    register_transformer("my_upper", lambda col: F.upper(col))
    out2 = apply_chain(smoke, [{"name": "my_upper", "column": "c0"}]).first()
    assert out2["c0"] == "DATAX"

    with pytest.raises(ValueError):
        register_transformer("dx_substr", lambda c: c)


def test_repetition_signals_crafted(spark):
    """Gopher repetition filters on crafted documents."""
    from datax_spark.functions.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),                  # one word dominates
            (2, "a b c d"),                              # all distinct
            (3, "x y x y x y"),                          # repeated bigram cycle
            (4, "solo"),                                 # single word, no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(docs, "text", "doc_id").collect()}
    assert rows[1].top_word_ratio == 1.0 and rows[1].distinct_ratio == 0.25
    assert rows[2].top_word_ratio == 0.25 and rows[2].distinct_ratio == 1.0
    # "x y" appears 3 of 5 bigrams
    assert rows[3].top_bigram_ratio == 0.6
    assert rows[4].n_words == 1 and rows[4].top_bigram_ratio is None


def test_unigram_logprob_orders_rarity(spark):
    """Docs made of rare words score lower than docs of common words;
    repartitioning does not change a single score (decimal sums)."""
    from datax_spark.functions.text import unigram_logprob
    from pyspark.sql import functions as F

    rows = [(i, "common words common words") for i in range(20)]
    rows.append((100, "common words common words"))
    rows.append((200, "zyzzyva qwyjibo xylotomous grimoire"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_logprob for r in unigram_logprob(docs, "text", "doc_id").collect()}
    assert out[200] < out[100]  # rare-word doc is the outlier
    out2 = {r.doc_id: r.avg_logprob
            for r in unigram_logprob(docs.repartition(13), "text", "doc_id").collect()}
    assert out == out2
