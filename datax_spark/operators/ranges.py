"""Binned (keyless) interval join: points → intervals containing them.

Spark compiles a non-equi predicate like ``s <= p AND p < e`` with no
equality key to BroadcastNestedLoopJoin — O(|P|·|I|) compares and a
broadcast of a whole side, which dies at scale. The standard fix (used
by every range-join-capable engine; Databricks exposes it as a "range
join hint") is BINNING, expressed here with plain DataFrame ops so
Catalyst/AQE still own the physical plan:

    intervals: explode sequence(floor(s/w), floor(e/w)) → (bin, interval)
    points:    bin = floor(p/w)
    equi-join on bin, then the exact s<=p<e filter re-applied

Each point lands in exactly ONE bin and an interval covers each of its
bins once, so no post-join dedup is needed — the equi-join output is
exactly the candidate set, shrunk from |P|·|I| to pairs sharing a bin.

Choosing ``bin_width``: ≈ the typical interval length. Too small →
interval fan-out (an interval replicates into length/width bins); too
big → loose candidates (a bin holds many non-overlapping points). Both
degrade gracefully; AQE absorbs moderate bin skew. Intervals vastly
longer than the width should be capped/split upstream (``max_bins``
guard below fails loudly instead of silently exploding a year-long
interval into 10^5 rows).

Engine-added surface (DataX has no relational algebra); oracle is the
plain non-equi join in DuckDB, which is feasible at oracle scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BIN = "__range_bin"


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    end_inclusive: bool = False,
    max_bins: int = 1024,
) -> DataFrame:
    """Inner-join points to the intervals containing them.

    All three boundary columns must be numeric (callers convert
    timestamps with ``unix_timestamp`` first — keeps this operator
    agnostic of time vs. price vs. offset axes). Output = point columns
    + interval columns for every (point, interval) containment pair;
    column-name collisions must be resolved by the caller upfront.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"ambiguous columns in both sides: {sorted(overlap)}")

    s, e, p = F.col(start_col), F.col(end_col), F.col(point_col)
    # NULL-bounded intervals can never contain a point — drop them like
    # the bin equi-join drops NULL points, instead of letting the NULL
    # reach assert_true (which aborts the job on a null condition with a
    # misleading runaway-interval message)
    intervals = intervals.filter(s.isNotNull() & e.isNotNull())
    lo_bin = F.floor(s / bin_width)
    hi_bin = F.floor(e / bin_width)
    # assert_true returns NULL (or raises), so the when() always takes the
    # sequence branch — a typed way to fail loudly on runaway intervals.
    guard = F.assert_true(
        hi_bin - lo_bin < max_bins,
        F.concat(F.lit(f"interval spans >= {max_bins} bins of {bin_width}; "
                       "raise bin_width or split the interval: start="),
                 s.cast("string"), F.lit(" end="), e.cast("string")))
    iv = intervals.withColumn(
        _BIN, F.explode(F.when(guard.isNull(), F.sequence(lo_bin, hi_bin))))
    pt = points.withColumn(_BIN, F.floor(p / bin_width))

    in_range = (s <= p) & ((p <= e) if end_inclusive else (p < e))
    return pt.join(iv, on=_BIN, how="inner").filter(in_range).drop(_BIN)
