"""KMV distinct sketch (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.sketches import kmv_distinct, kmv_kth_hash


def test_exact_below_k(spark):
    df = spark.range(0, 50).select(F.col("id").cast("string").alias("v"))
    row = kmv_distinct(df, ["v"], k=128).first()
    assert row.n_kept == 50 and row.est_distinct == 50.0


def test_estimate_within_error_bound(spark):
    """10k distinct values, k=256 → relative error ≈ 1/sqrt(k-2) ≈ 6.3%;
    assert a loose 3-sigma band (deterministic, so this pins behavior)."""
    df = spark.range(0, 10_000).select(F.col("id").cast("string").alias("v"))
    est = kmv_distinct(df, ["v"], k=256).first().est_distinct
    assert 10_000 * 0.81 < est < 10_000 * 1.19


def test_duplicates_do_not_inflate(spark):
    base = spark.range(0, 2_000).select(F.col("id").cast("string").alias("v"))
    dup = base.union(base).union(base)
    assert (kmv_distinct(dup, ["v"], k=256).first().est_distinct
            == kmv_distinct(base, ["v"], k=256).first().est_distinct)


def test_prefilter_preserves_sketch(spark):
    """Passing a previous run's k-th hash as prefilter must not change the
    sketch (the k smallest are all <= any previous k-th value)."""
    df = spark.range(0, 5_000).select(F.col("id").cast("string").alias("v"))
    kth = kmv_distinct(df, ["v"], k=128).first().kth_hash
    plain = kmv_distinct(df, ["v"], k=128).first()
    filtered = kmv_distinct(df, ["v"], k=128, prefilter=kth).first()
    assert (plain.kth_hash, plain.est_distinct) == (filtered.kth_hash, filtered.est_distinct)


def test_kth_hash_state_is_k_rows_sorted(spark):
    df = spark.range(0, 1_000).select(F.col("id").cast("string").alias("v"))
    hashes = [r.h for r in kmv_kth_hash(df, ["v"], k=64).collect()]
    assert len(hashes) == 64 and hashes == sorted(hashes)


def test_k_guard(spark):
    df = spark.range(0, 10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="k must be >= 3"):
        kmv_kth_hash(df, ["v"], k=2)


# ------------------------------------------------------- count-min sketch

def test_cms_counters_and_estimate(spark):
    """CMS counters are exact per (d, bucket); estimates upper-bound true
    frequencies and are exact when no collision; mergeability: sketch of
    a union == union+sum of sketches."""
    from pyspark.sql import functions as F

    from datax_spark.operators.sketches import cms_counts, cms_estimate
    from datax_spark.oracle.xxh64 import spark_xxhash64

    width, depth = 32, 4
    vals = ["a"] * 50 + ["b"] * 20 + [f"w{i}" for i in range(30)]
    df = spark.createDataFrame([(v,) for v in vals], "w string")
    counters = [tuple(r) for r in cms_counts(df, ["w"], depth=depth, width=width).collect()]
    # every counter row d sums to the total count
    import collections
    per_d = collections.Counter()
    for d, _b, c in counters:
        per_d[d] += c
    assert per_d == {d: len(vals) for d in range(depth)}

    def est(key):
        hashes = [spark_xxhash64(("str", key), ("int", d)) for d in range(depth)]
        return cms_estimate(counters, hashes, width=width)

    assert est("a") >= 50 and est("b") >= 20  # never under-counts
    assert est("absent-key") <= 50            # bounded by collisions

    # mergeability: union+sum of two half-sketches == sketch of the union
    d1 = spark.createDataFrame([(v,) for v in vals[:40]], "w string")
    d2 = spark.createDataFrame([(v,) for v in vals[40:]], "w string")
    merged = (
        cms_counts(d1, ["w"], depth=depth, width=width)
        .unionByName(cms_counts(d2, ["w"], depth=depth, width=width))
        .groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(counters)


def test_heavy_hitters_exact_vs_naive(spark):
    """CMS-prefiltered heavy hitters are byte-identical to the naive
    groupBy/HAVING — even at a deliberately collision-heavy width where
    nearly every key becomes a candidate."""
    from datax_spark.operators.sketches import heavy_hitters
    from pyspark.sql import functions as F

    # zipf-ish: key k appears ~ 2000/k times, 300 distinct keys
    df = spark.range(20_000).select(
        (F.floor(2000 / (F.pmod(F.xxhash64("id"), 300) + 1))).alias("k")
    )
    want = sorted(
        (r["k"], r["n"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"))
        .where(F.col("n") >= 100).collect()
    )
    for width in (4096, 64):  # clean and collision-heavy
        got = sorted(
            (r["k"], r["n"])
            for r in heavy_hitters(df, ["k"], 100, depth=4, width=width).collect()
        )
        assert got == want, f"width={width}"
    assert len(want) > 3


def test_heavy_hitters_multi_col_and_nulls(spark):
    from datax_spark.operators.sketches import heavy_hitters
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1)] * 60 + [("a", 2)] * 10 + [("b", 1)] * 55 + [(None, None)] * 40,
        "x string, y int",
    )
    got = {(r["x"], r["y"]): r["n"]
           for r in heavy_hitters(df, ["x", "y"], 50).collect()}
    assert got == {("a", 1): 60, ("b", 1): 55}  # all-null group under threshold

    # the all-NULL key group carries no CMS mass but must still be
    # reported when it clears min_count — byte-identity with the naive
    # plan includes it (it bypasses the prefilter into the exact count)
    got2 = {(r["x"], r["y"]): r["n"]
            for r in heavy_hitters(df, ["x", "y"], 40).collect()}
    assert got2 == {("a", 1): 60, ("b", 1): 55, (None, None): 40}
    # partial-null keys DO carry CMS mass and prefilter normally
    df3 = df.union(spark.createDataFrame([("c", None)] * 45, "x string, y int"))
    got3 = {(r["x"], r["y"]): r["n"]
            for r in heavy_hitters(df3, ["x", "y"], 45).collect()}
    assert got3 == {("a", 1): 60, ("b", 1): 55, ("c", None): 45}


def test_binned_quantiles_bounded_error_and_mergeable(spark):
    """Histogram quantiles land within one bin width of the exact
    quantiles; two shard histograms merged by per-bin sum equal the
    whole-table histogram (the mergeability contract)."""
    from pyspark.sql import functions as F

    from datax_spark.operators.sketches import binned_counts, binned_quantiles

    df = spark.range(10_000).select(
        (F.pmod(F.xxhash64("id"), 1000) / 10.0).alias("v"))  # ~uniform [0,100)
    lo, hi, bins = 0.0, 100.0, 200
    counts = [(r["bin"], r["cnt"])
              for r in binned_counts(df, "v", lo, hi, bins).collect()]
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    est = binned_quantiles(counts, qs, lo, hi, bins)
    exact = df.approxQuantile("v", qs, 0.0)
    w = (hi - lo) / bins
    assert all(abs(e - x) <= w for e, x in zip(est, exact)), (est, exact)

    # mergeability: shard histograms sum to the global one
    a = binned_counts(df.where(F.col("v") < 37), "v", lo, hi, bins).collect()
    b = binned_counts(df.where(F.col("v") >= 37), "v", lo, hi, bins).collect()
    merged = {}
    for r in list(a) + list(b):
        merged[r["bin"]] = merged.get(r["bin"], 0) + r["cnt"]
    assert merged == {r[0]: r[1] for r in counts}

    # clamp tails: out-of-range mass lands in the edge bins, never lost
    z = spark.createDataFrame([(-5.0,), (500.0,), (None,)], "v double")
    zc = {r["bin"]: r["cnt"] for r in binned_counts(z, "v", lo, hi, bins).collect()}
    assert zc == {0: 1, bins - 1: 1}

    import pytest

    with pytest.raises(ValueError):
        binned_counts(df, "v", 10.0, 10.0, 4)
