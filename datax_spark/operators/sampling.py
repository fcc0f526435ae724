"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need train/val/test assignment that is (a)
reproducible across runs and engines, (b) stable under repartitioning
and insertion order, and (c) content-keyed so the same document never
leaks across splits when the corpus is rebuilt. ``df.randomSplit`` is
none of these (seed + partition layout dependent). The standard answer
is a hash split: bucket = xxhash64(key columns, salt) mod R, split by
cumulative fraction boundaries — pure JVM expressions, auditable by the
pure-python xxh64 oracle.

Salting: a different ``salt`` gives an independent assignment (e.g. for
cross-validation folds); the same salt is a contract — document it with
the dataset.

Scale: a codegen projection, no shuffle, no state. Skew-free by
construction (xxhash64 is uniform).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

RESOLUTION = 1_000_000


def _bucket(cols: list[str], salt: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(salt)), F.lit(RESOLUTION))


def hash_split(
    df: DataFrame,
    cols: list[str],
    fractions: dict[str, float],
    salt: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` assigning each row to a named split by the hash
    of ``cols``. Fractions must sum to 1 (±1e-9); the last split absorbs
    boundary rounding."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if len(fractions) < 2:
        raise ValueError("need at least two splits")
    names = list(fractions)
    b = _bucket(cols, salt)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        bound = int(round(cum * RESOLUTION))
        expr = F.when(b < bound, name) if expr is None else expr.when(b < bound, name)
    return df.withColumn(split_col, expr.otherwise(names[-1]))


def sample_by_hash(df: DataFrame, cols: list[str], fraction: float, salt: int = 42) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash bucket falls
    below ``fraction`` — same rows every run, any partitioning."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(cols, salt) < int(round(fraction * RESOLUTION)))


def sample_stratified(
    df: DataFrame,
    cols: list[str],
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sampling (``df.sampleBy`` without the
    seed/partition nondeterminism): each stratum keeps its own fraction
    of rows, selected by content hash — the standard tool for rebalancing
    a corpus (e.g. downsample English, keep all low-resource languages).
    Strata absent from ``fractions`` keep ``default_fraction``. Still a
    zero-shuffle codegen projection; sampled sets nest across fractions
    per stratum (same salt)."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
    pairs = [x for s, f in sorted(fractions.items())
             for x in (F.lit(s), F.lit(int(round(f * RESOLUTION))))]
    bound = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col)),
        F.lit(int(round(default_fraction * RESOLUTION))),
    )
    return df.filter(_bucket(cols, salt) < bound)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_cols: list[str],
    salt: int = 42,
) -> DataFrame:
    """Weighted random sampling WITHOUT replacement of ``k`` rows —
    Efraimidis-Spirakis exponential race, derandomized by content hash.

    Each row draws u = hash-uniform(0,1] from its key columns and salt,
    and scores ``-ln(u) / w``; the k SMALLEST scores win. Inclusion
    probability is proportional to weight (e.g. token count for
    length-weighted corpus subsampling), yet the draw is reproducible
    across runs, engines, and partitionings — the same contract as
    :func:`hash_split`.

    Scale: zero-shuffle scoring projection + TakeOrdered (per-partition
    top-k, driver merges k·n_partitions candidate rows — never a global
    sort). Rows with NULL or non-positive weight are excluded (they have
    no sampling mass).
    """
    # uniform draw in (0, 1]: the hash's top 63 bits via unsigned shift
    # (overflow-free under ANSI — never F.abs, abs(Long.MIN_VALUE) throws)
    u = (
        (F.shiftrightunsigned(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(salt)), 1) + 1)
        .cast("double") / F.lit(float(2 ** 63))
    )
    score = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_wscore", score)
        .orderBy("_wscore")
        .limit(k)
        .drop("_wscore")
    )
