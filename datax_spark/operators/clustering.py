"""Distributed k-means clustering over an embedding column.

The PQ/IVF trainers (``operators/pq.py``) fit on a bounded driver
sample — right for codebooks, wrong for CLUSTERING 10^9 vectors where
every row needs an assignment and the update must see all of them. This
module is the distributed Lloyd iteration:

- **assign**: centroids broadcast in the UDF closure (k×dim float64 —
  KBs), one Arrow-batched argmin per batch; zero shuffle.
- **update**: per-(cluster, dim) component sums via ``posexplode`` →
  hash aggregate with map-side combine — the exchange carries ≤ k×dim
  rows per task; the driver receives k×dim sums total.

Determinism discipline (same as the corpus-LM op in functions/text.py):
component sums are DECIMAL(30,15) — exact and partition-order-free, so
repeated runs, repartitionings, AND the pure-python oracle
(oracle/pyref.py::kmeans_rows) produce bit-identical centroids; float64
distance math is elementwise per row (no cross-row reduction), ties
break to the lowest centroid index on both sides. Init is the
farthest-point seeding over the ``init_sample`` lowest-id vectors — no
RNG anywhere. Fixed ``iters`` (no data-dependent convergence test) keeps
the iteration count itself deterministic.

Precision budget: DECIMAL(30,15) sums overflow above ~10^15 total
magnitude per (cluster, dim) — at |component| ≤ 1 that is 10^15 rows per
cluster; raise the precision (38,12) for pathological scales.

k budget: both the closure-broadcast centroid matrix and the per-update
driver sums are Θ(k·dim); ``MAX_CENTROID_COMPONENTS`` (2^23 ≈ 64 MB of
float64) guards the design's honest ceiling with a ValueError instead
of an OOM. SemDeDup-paper k (~10^5 at 768-dim) exceeds it — shard the
corpus or use the LSH/IVF paths for that regime.

Engine-added surface (the reference has no numeric compute at all);
clustering is the standard precursor to semantic dedup / diversity
sampling over training corpora.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["farthest_point_init", "kmeans_assign", "kmeans_fit",
           "kmeans_predict", "semantic_dedup_pairs"]


def farthest_point_init(X: np.ndarray, k: int) -> np.ndarray:
    """Deterministic seeding: first vector, then repeatedly the point
    farthest from its nearest chosen centroid (ties → lowest index,
    numpy argmax). Same scheme as the PQ/IVF trainers."""
    cents = [X[0]]
    d2 = ((X - cents[0]) ** 2).sum(axis=1)
    while len(cents) < k:
        i = int(np.argmax(d2))
        cents.append(X[i])
        d2 = np.minimum(d2, ((X - X[i]) ** 2).sum(axis=1))
    return np.array(cents, dtype="float64")


def _assign_udf(centroids: np.ndarray):
    C = np.asarray(centroids, dtype="float64")

    def _fn(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        M = np.vstack([np.asarray(x, dtype="float64") for x in v])
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return F.pandas_udf(_fn, T.IntegerType())


def kmeans_assign(df: DataFrame, centroids: np.ndarray,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, cluster) — nearest-centroid assignment, zero shuffle. NULL
    vectors carry no position and are dropped (mirrors the fit, which
    never sees them either)."""
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), _assign_udf(centroids)(F.col(vec_col)).alias("cluster")
    )


# Hard ceiling on k×dim: the assign UDF broadcasts the full float64
# centroid matrix in its closure and each Lloyd update lands k×dim
# decimal sums on the driver — both are Θ(k·dim) DRIVER-memory costs by
# design. 2^23 components = 64 MB matrix / ~10^7 sum rows: comfortably
# inside a default driver, an order of magnitude under trouble. At
# SemDeDup-paper k (~10^5 × 768-dim ≈ 7.7·10^7) this design is the
# wrong tool — shard the corpus (fit per shard) or use the IVF/LSH
# paths in operators/similarity.py; the guard makes that a loud
# ValueError instead of an executor/driver OOM.
MAX_CENTROID_COMPONENTS = 1 << 23


def _check_centroid_budget(k: int, dim: int) -> None:
    if k * dim > MAX_CENTROID_COMPONENTS:
        raise ValueError(
            f"k*dim = {k}*{dim} = {k * dim} exceeds the broadcast-closure "
            f"design ceiling ({MAX_CENTROID_COMPONENTS}); the centroid "
            "matrix rides the assign UDF closure and the Lloyd update "
            "collects k*dim sums to the driver. For extreme k, shard the "
            "corpus or use the LSH/IVF paths in operators/similarity.py."
        )


def _exact_update(df: DataFrame, centroids: np.ndarray, vec_col: str) -> np.ndarray:
    """One Lloyd update with order-free decimal component sums; empty
    clusters keep their previous centroid. The k×dim sums come back via
    Arrow (``toPandas``) — columnar, ~10× lighter on the driver than
    Row-object ``collect`` at large k."""
    k, dim = centroids.shape
    _check_centroid_budget(k, dim)
    ex = df.where(F.col(vec_col).isNotNull()).select(
        _assign_udf(centroids)(F.col(vec_col)).alias("cluster"),
        F.posexplode(vec_col).alias("dim", "val"),
    )
    pdf = (
        ex.groupBy("cluster", "dim")
        .agg(
            F.sum(F.col("val").cast("double").cast("decimal(30,15)")).alias("s"),
            F.count("*").alias("n"),
        )
        .toPandas()
    )
    new = centroids.copy()
    counts: dict[int, int] = {}
    sums: dict[tuple[int, int], Decimal] = {}
    for c, d, s, n in zip(pdf["cluster"], pdf["dim"], pdf["s"], pdf["n"]):
        sums[(int(c), int(d))] = s
        counts[int(c)] = int(n)
    for c in range(k):
        n = counts.get(c)
        if not n:
            continue
        for d in range(dim):
            new[c, d] = float(sums[(c, d)]) / n
    return new


def kmeans_fit(
    df: DataFrame, k: int, iters: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    init_sample: int = 256,
) -> np.ndarray:
    """Fit k centroids with ``iters`` distributed Lloyd iterations.
    Deterministic end to end (see module docstring); cost per iteration
    is one corpus pass + a k×dim-bounded exchange."""
    rows = (
        df.where(F.col(vec_col).isNotNull())
        .select(id_col, vec_col).orderBy(F.asc(id_col)).limit(init_sample).collect()
    )
    X = np.array([[float(x) for x in r[vec_col]] for r in rows], dtype="float64")
    if len(X):
        _check_centroid_budget(k, X.shape[1])
    if len(X) < k:
        raise ValueError(f"need >= k={k} vectors to initialize, got {len(X)}")
    C = farthest_point_init(X, k)
    for _ in range(iters):
        C = _exact_update(df, C, vec_col)
    return C


def kmeans_predict(df: DataFrame, centroids: np.ndarray,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Alias of :func:`kmeans_assign` for the fit→predict idiom."""
    return kmeans_assign(df, centroids, id_col, vec_col)


def decimal_component(v: float) -> Decimal:
    """The exact value Spark's ``cast(double AS DECIMAL(30,15))``
    produces, for oracle replay: exact binary expansion rounded HALF_UP
    to 15 fractional digits."""
    return Decimal(float(v)).quantize(Decimal("1e-15"), rounding=ROUND_HALF_UP)


def semantic_dedup_pairs(
    df: DataFrame, k: int = 8, iters: int = 3, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    target_cluster_size: int | None = None,
    max_pair_estimate: int | None = None,
) -> DataFrame:
    """SemDeDup-style near-duplicate pairs: all-pairs cosine confined
    WITHIN k-means clusters (Abbas et al. 2023's observation — semantic
    duplicates share a cluster, so the O(n²) comparison shrinks to
    Σ|cluster|², and k is the knob trading recall for cost; pair with
    the LSH path in ``operators/similarity.py`` when clusters are still
    too large). Join is an equi-join on the cluster id; cosine runs
    JVM-side (zip_with/aggregate — no Python per pair).

    **Scale protocol (the r5 sf1 lesson — 30x wall at 10x data under
    fixed k):** pass ``target_cluster_size`` instead of ``k`` and k is
    derived as ceil(n / target_cluster_size) — the SemDeDup paper's own
    protocol (cluster sizes stay constant as n grows, so Σ|cluster|²
    ≈ n·target stays LINEAR in n instead of quadratic). When either
    ``target_cluster_size`` or ``max_pair_estimate`` is given, the
    operator also counts cluster sizes after assignment (a k-row
    aggregate) and raises/warns when the Σ|cluster|² pair estimate
    exceeds ``max_pair_estimate`` — a loud guard instead of a silent
    quadratic cliff. With a bare explicit ``k`` both extra jobs are
    skipped (byte-compatible with the pre-r6 call shape).

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine ≥ threshold,
    cosine rounded to 4 places (oracle-stable)."""
    from datax_spark.operators.similarity import _dot, _norm

    if target_cluster_size is not None:
        if centroids is not None:
            raise ValueError("pass either centroids or target_cluster_size")
        n = df.where(F.col(vec_col).isNotNull()).count()
        k = max(1, -(-n // int(target_cluster_size)))
    C = centroids if centroids is not None else kmeans_fit(
        df, k, iters, id_col, vec_col)
    # assignment is a zero-shuffle PROJECTION of df — select it inline
    # instead of joining df back onto kmeans_assign(df) by id (the r5
    # shape), which re-scanned the corpus and paid a full self-join
    # exchange just to attach a column the scan can compute itself.
    # Norms are likewise hoisted out of the pair loop: |v| depends only
    # on the row, so computing it once per SIDE leaves a single O(dim)
    # fold (the dot) per candidate pair instead of three.
    tagged = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        _assign_udf(C)(F.col(vec_col)).alias("cluster"),
    ).withColumn("_n", _norm(F.col("_v")))
    if target_cluster_size is not None or max_pair_estimate is not None:
        sizes = [int(r["c"]) for r in
                 tagged.groupBy("cluster").agg(F.count("*").alias("c")).collect()]
        est = sum(c * c for c in sizes)
        if max_pair_estimate is not None and est > max_pair_estimate:
            raise ValueError(
                f"semantic dedup pair estimate Σ|cluster|² = {est} exceeds "
                f"max_pair_estimate={max_pair_estimate}; raise k / lower "
                f"target_cluster_size (largest cluster: {max(sizes)})")
    left = tagged.select(
        F.col(id_col).alias("id_a"), F.col("cluster"),
        F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    right = tagged.select(
        F.col(id_col).alias("id_b"), F.col("cluster"),
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        left.join(right, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )
