"""Deterministic cardinality sketches.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but
its register layout is opaque to any independent oracle. The KMV
(k-minimum-values) estimator [Bar-Yossef et al. 2002] gives the same
"count distinct without holding the distinct set" capability with a
fully auditable definition: hash every value with xxhash64, keep the k
smallest DISTINCT hashes, and estimate

    N̂ = (k - 1) / u_k,   u_k = (h_k + 2^63 + 1) / 2^64

(u_k maps the signed 64-bit k-th smallest hash onto (0, 1]). The whole
sketch is reproducible bit-for-bit by the pure-python xxh64 oracle, so
unlike HLL it slots into the driver's DuckDB hash-compare gate.

Plan shape: one hash-aggregate on the hash value (map-side partial
dedup, so the exchange carries each partition's distinct hashes once,
never raw rows) followed by TakeOrderedAndProject for the global
k-smallest — no full sort, no collect of the distinct set. At 10^9+
distinct keys the dedup exchange is the dominant cost; repeated
estimations over the same (growing) table should pass ``prefilter``
= a previous run's k-th hash to cut the scan down to survivors before
the exchange (standard KMV refinement; estimate unchanged because the
k smallest are always below any previous k-th value).

Relative error ≈ 1/sqrt(k-2) (~6% at k=256).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TWO63 = 1 << 63
_TWO64 = float(1 << 64)


def kmv_kth_hash(df: DataFrame, cols: list[str], k: int = 256,
                 prefilter: int | None = None) -> DataFrame:
    """The sketch state: k smallest distinct xxhash64 values of ``cols``
    (fewer rows than k means the input had < k distinct values — the
    estimate is then exact)."""
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    h = F.xxhash64(*[F.col(c) for c in cols]).alias("h")
    # NULLs are not values: xxhash64 SKIPS null inputs (returning the
    # seed-derived hash), which would count "all-null" as one distinct
    # value — drop all-null rows to match distinct-count semantics (and
    # the pure-python oracle, which filters None).
    any_set = F.col(cols[0]).isNotNull()
    for c in cols[1:]:
        any_set = any_set | F.col(c).isNotNull()
    out = df.filter(any_set).select(h)
    if prefilter is not None:
        out = out.filter(F.col("h") <= F.lit(int(prefilter)))
    return out.distinct().orderBy("h").limit(k)


def hll_registers(df: DataFrame, cols: list[str], p: int = 6) -> DataFrame:
    """Deterministic HyperLogLog register table over xxhash64(cols).

    Spark's own ``approx_count_distinct`` is HLL++ with an opaque binary
    state; this is the textbook HLL [Flajolet et al. 2007] expressed as
    auditable DataFrame ops so an independent oracle can reproduce the
    registers bit-for-bit (the same reason sketches.py prefers KMV):

    - bucket = low ``p`` bits of the hash (0 .. 2^p-1)
    - rho    = leading-zero count of the remaining 64-p bits + 1,
               computed as ``(64-p) + 1 - length(bin(rest))`` — a pure
               string-length trick that stays in whole-stage codegen
               (``bin`` drops leading zeros; rest == 0 ⇒ length term 0
               via the null-to-zero guard ⇒ rho = 64-p+1, the cap).

    Returns (bucket int, max_rho int), observed buckets only (absent
    bucket ≡ register 0). Plan: one projection + one groupBy(bucket)
    max() — the exchange carries at most 2^p rows per upstream task
    (map-side combine), so the sketch costs one scan at any scale.
    Mergeability is the whole point: register tables from disjoint
    partitions/tables union + re-max to the sketch of the union.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    h = F.xxhash64(*[F.col(c) for c in cols])
    any_set = F.col(cols[0]).isNotNull()
    for c in cols[1:]:
        any_set = any_set | F.col(c).isNotNull()
    width = 64 - p
    bucket = h.bitwiseAND(F.lit((1 << p) - 1)).cast("int")
    rest = F.shiftrightunsigned(h, p)
    bitlen = F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    rho = (F.lit(width + 1) - bitlen).cast("int")
    return (
        df.filter(any_set)
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: list[tuple[int, int]], p: int = 6) -> float:
    """Driver-side estimate from an (already tiny) register table —
    standard HLL harmonic mean with the small-range linear-counting
    correction. ``registers`` = [(bucket, max_rho), ...]."""
    import math

    m = 1 << p
    regs = [0] * m
    for b, r in registers:
        regs[b] = max(regs[b], r)
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw


def kmv_distinct(df: DataFrame, cols: list[str], k: int = 256,
                 prefilter: int | None = None) -> DataFrame:
    """One-row DataFrame: (k, n_kept, kth_hash, est_distinct).

    ``est_distinct`` is exact (= n_kept) when the input has fewer than k
    distinct values, else the KMV estimate from the k-th smallest hash.
    """
    kept = kmv_kth_hash(df, cols, k=k, prefilter=prefilter)
    u_k = (F.max("h").cast("double") + F.lit(float(_TWO63 + 1))) / F.lit(_TWO64)
    est = F.when(F.count("h") < k, F.count("h").cast("double")) \
           .otherwise(F.lit(float(k - 1)) / u_k)
    return kept.agg(
        F.lit(k).alias("k"),
        F.count("h").cast("int").alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.round(est, 2).alias("est_distinct"),
    )


def cms_counts(df: DataFrame, cols: list[str], depth: int = 4,
               width: int = 256) -> DataFrame:
    """Deterministic count-min sketch: (d, bucket, cnt) counter rows over
    ``depth`` independent hash rows of width ``width``.

    Like the KMV/HLL sketches in this module, the hash family is
    auditable — row d's bucket = pmod(xxhash64(cols..., d), width) — so
    an independent oracle reproduces every counter exactly (Spark's own
    count_min_sketch agg is an opaque binary). Point estimate for a key:
    min over d of counter[d][h_d(key)] (``cms_estimate``); counters are
    mergeable across partitions/tables by union + per-(d,bucket) sum —
    the property that makes frequency monitoring of a 100 TB stream a
    union of per-shard sketches.

    Plan: one generator explode (×depth rows, each a 12-byte (d,bucket)
    pair — never the input payload) → groupBy(d,bucket) count with
    map-side combine, so the exchange carries at most depth×width rows
    per upstream task regardless of input size.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}, {width}")
    any_set = F.col(cols[0]).isNotNull()
    for c in cols[1:]:
        any_set = any_set | F.col(c).isNotNull()
    pairs = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(d)), F.lit(width))
             .cast("int").alias("bucket"),
        )
        for d in range(depth)
    ])
    return (
        df.filter(any_set)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(counters: list[tuple[int, int, int]], key_hashes: list[int],
                 width: int = 256) -> int:
    """Driver-side point estimate from a collected counter table.
    ``key_hashes``: xxhash64(key, d) for d = 0..depth-1 (caller computes
    with the same family, e.g. via one Spark row or oracle/xxh64)."""
    table: dict[tuple[int, int], int] = {(d, b): c for d, b, c in counters}
    # python's % on a negative hash is already non-negative == Spark pmod
    return min(table.get((d, h % width), 0) for d, h in enumerate(key_hashes))


def heavy_hitters(df: DataFrame, cols: list[str], min_count: int,
                  depth: int = 4, width: int = 8192) -> DataFrame:
    """EXACT keys with frequency ≥ ``min_count`` — CMS-prefiltered.

    The naive ``groupBy(cols).count().where(n >= T)`` puts one combined
    row per distinct key per upstream task on the exchange; over a
    heavy-tailed key space (web n-grams: 10⁹+ distinct, almost all rare)
    the exchange is dominated by tail keys that can never pass the
    threshold. Two passes fix that:

    1. :func:`cms_counts` (one pass; exchange ≤ depth×width counter rows
       per task) → collected to a depth×width numpy matrix (driver holds
       KBs, broadcast back in the UDF closure).
    2. rows whose key's CMS estimate clears ``min_count`` survive —
       CMS only OVERcounts, so survivors ⊇ true heavy hitters — then an
       exact count over survivors confirms. The pass-2 exchange carries
       only candidate keys (true heavies + collision lottery winners).

    Result is byte-identical to the naive plan — which is exactly what
    the SQL oracle checks. Rows whose key columns are ALL NULL carry no
    CMS mass (:func:`cms_counts` skips them), so they bypass the
    prefilter and go straight to the exact count — the all-NULL group is
    reported iff the naive plan reports it, at the cost of that one
    group always reaching the exchange. Width trades driver memory for
    candidate purity: collisions at width ≪ distinct-keys admit extra
    candidates (cost), never wrong output. Hash positions are computed
    JVM-side; the matrix gather is one Arrow-batched numpy min — no
    per-row python.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as _T

    # Arrow collect (toPandas), not Row-object collect: the counter
    # table is depth×width rows (16k at the gate's width) and the Row
    # path deserializes each into a python object; columnar transport
    # is ~10x lighter and the int64 values are identical (r6).
    counters = cms_counts(df, cols, depth, width).toPandas()
    mat = np.zeros((depth, width), dtype=np.int64)
    mat[counters["d"].to_numpy(), counters["bucket"].to_numpy()] = (
        counters["cnt"].to_numpy())
    thresh = int(min_count)

    def _ge(pos_arr):
        if len(pos_arr) == 0:
            return pd.Series([], dtype=bool)
        p = np.vstack(pos_arr.to_numpy())               # (rows, depth)
        est = mat[np.arange(p.shape[1])[None, :], p].min(axis=1)
        return pd.Series(est >= thresh)

    ge_udf = F.pandas_udf(_ge, _T.BooleanType())
    pos = F.array(*[
        F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(d)), F.lit(width)).cast("int")
        for d in range(depth)
    ])
    any_set = F.col(cols[0]).isNotNull()
    for c in cols[1:]:
        any_set = any_set | F.col(c).isNotNull()
    return (
        df.where(~any_set | ge_udf(pos))
        .groupBy(*cols)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= thresh)
    )


def binned_counts(df: DataFrame, col: str, lo: float, hi: float,
                  bins: int = 256) -> DataFrame:
    """(bin, cnt) — fixed-width histogram counts over [lo, hi).

    The deterministic, MERGEABLE quantile substrate (union + per-bin sum
    merges shards/ticks — what monitoring systems actually run): unlike
    GK/t-digest sketches, the state does not depend on arrival or
    partition order, so repeated runs, repartitionings, and the SQL
    oracle agree exactly. One hash aggregate; the exchange carries ≤
    bins+2 rows per task. Values below lo clamp to bin 0, at/above hi to
    bin bins-1 (closed tails — mass is never dropped); NULLs carry no
    mass. Bin width = (hi - lo) / bins bounds the quantile error."""
    if not (hi > lo) or bins < 1:
        raise ValueError(f"need hi > lo and bins >= 1; got {lo}, {hi}, {bins}")
    w = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col).cast("double") - lo) / w).cast("int")),
    )
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


def binned_quantiles(counts: list[tuple[int, int]], qs: list[float],
                     lo: float, hi: float, bins: int = 256) -> list[float]:
    """Driver-side quantile estimates from collected (bin, cnt) rows:
    for quantile q, find the bin holding the ceil(q·n)-th value and
    linearly interpolate inside it. Deterministic given the counts."""
    w = (hi - lo) / bins
    tab = {int(b): int(c) for b, c in counts}
    n = sum(tab.values())
    if n == 0:
        return [float("nan")] * len(qs)
    out = []
    for q in qs:
        # rank rule: 1-based index floor(q·(n-1))+1 — deterministic,
        # endpoints map to min/max
        target = max(1, min(n, int(q * (n - 1)) + 1))
        acc = 0
        for b in range(bins):
            c = tab.get(b, 0)
            if acc + c >= target:
                frac = (target - acc) / c
                out.append(lo + (b + frac) * w)
                break
            acc += c
    return out
