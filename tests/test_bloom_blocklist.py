"""Bloom semi-join pruning, domain blocklist, weighted sampling, NFC
normalization — round-4 late additions."""

import math

from pyspark.sql import functions as F


def test_bloom_build_and_probe_exact_membership(spark):
    """Every inserted key tests positive (no false negatives ever);
    false-positive rate on disjoint probes stays near the design fpp."""
    from datax_spark.operators.bloom import bloom_build, bloom_prune

    small = spark.range(0, 1000).select(F.col("id").alias("k"))
    bf = bloom_build(small, "k", num_bits=1 << 16, num_hashes=5)
    assert bf.size_bytes == (1 << 16) // 8

    # no false negatives: pruning the inserted set keeps all of it
    kept = bloom_prune(small, bf, "k").count()
    assert kept == 1000

    # disjoint probe set: a few false positives allowed, most pruned
    probe = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    fp = bloom_prune(probe, bf, "k").count()
    assert fp < 10_000 * 0.05, fp  # well under 5% at this sizing


def test_bloom_semi_join_equals_plain_semi_join(spark):
    """The bloom prune never changes the result — byte-identical to the
    plain semi join (false positives removed by the exact join)."""
    from datax_spark.operators.bloom import bloom_semi_join

    big = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("k"), F.col("id").alias("payload")
    )
    small = spark.range(0, 50).select((F.col("id") * 7).alias("j"))
    got = bloom_semi_join(big, small, "k", "j", num_bits=1 << 14)
    want = big.join(
        small.select(F.col("j").alias("k")).distinct(), "k", "left_semi"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_null_keys_dropped(spark):
    from datax_spark.operators.bloom import bloom_build, bloom_prune

    df = spark.createDataFrame([(1,), (None,)], "k int")
    bf = bloom_build(df, "k", num_bits=1 << 10)
    assert [r["k"] for r in bloom_prune(df, bf, "k").collect()] == [1]


def test_blocklist_blocks_subdomain_tree(spark):
    from datax_spark.functions.urls import blocklist_filter

    urls = spark.createDataFrame(
        [
            ("http://a.b.example.com/x",),     # under example.com -> blocked
            ("http://example.com/y",),          # exact -> blocked
            ("http://notexample.com/z",),       # suffix of the STRING but not a subdomain
            ("http://ok.org/w",),               # kept
            ("not a url at all",),              # unparsable host -> kept (policy)
        ],
        "url string",
    )
    bl = spark.createDataFrame([("example.com",)], "domain string")
    kept = sorted(r["url"] for r in blocklist_filter(urls, "url", bl).collect())
    assert kept == ["http://notexample.com/z", "http://ok.org/w", "not a url at all"]


def test_weighted_sample_deterministic_and_weight_biased(spark):
    from datax_spark.operators.sampling import weighted_sample

    # 200 light rows (w=1) + 200 heavy rows (w=50)
    df = spark.range(400).select(
        F.col("id"),
        F.when(F.col("id") < 200, F.lit(1)).otherwise(F.lit(50)).alias("w"),
    )
    s1 = sorted(r["id"] for r in weighted_sample(df, "w", 40, ["id"]).collect())
    s2 = sorted(r["id"] for r in weighted_sample(df, "w", 40, ["id"]).collect())
    assert s1 == s2  # reproducible
    heavy = sum(1 for i in s1 if i >= 200)
    assert heavy > 30  # heavy rows dominate ~50:1

    # python replay of the race matches the engine's selection exactly
    from datax_spark.oracle.xxh64 import spark_xxhash64

    scored = []
    for i in range(400):
        w = 1 if i < 200 else 50
        h = spark_xxhash64(("long", i), ("int", 42))
        u = (((h & 0xFFFFFFFFFFFFFFFF) >> 1) + 1) / float(2 ** 63)
        scored.append((-math.log(u) / w, i))
    expect = sorted(i for _s, i in sorted(scored)[:40])
    assert s1 == expect

    # zero/null weights carry no mass
    z = spark.createDataFrame([(1, 0), (2, None), (3, 5)], "id long, w int")
    assert [r["id"] for r in weighted_sample(z, "w", 3, ["id"]).collect()] == [3]


def test_normalize_unicode_nfc_and_nfkc(spark):
    from datax_spark.functions.text import normalize_unicode

    # decomposed e+U+0301, decomposed A+U+030A, fi-ligature U+FB01
    df = spark.createDataFrame([("e\u0301 A\u030a \ufb01",)], "s string")
    nfc = df.select(normalize_unicode(F.col("s"), "NFC").alias("n")).first()["n"]
    assert nfc == "\u00e9 \u00c5 \ufb01"  # composed; ligature untouched by NFC
    nfkc = df.select(normalize_unicode(F.col("s"), "NFKC").alias("n")).first()["n"]
    assert nfkc == "\u00e9 \u00c5 fi"  # NFKC also folds the ligature

    import pytest

    with pytest.raises(ValueError):
        normalize_unicode(F.col("s"), "NFX")


def test_weighted_sample_plan_is_takeordered(spark):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    top-k, driver merges k candidates per partition) — never a global
    Sort+Exchange, which would be the 100 TB scale-killer."""
    from datax_spark.operators.sampling import weighted_sample

    df = spark.range(10_000).select(
        F.col("id"), (F.pmod(F.col("id"), 7) + 1).alias("w"))
    plan = weighted_sample(df, "w", 10, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan
