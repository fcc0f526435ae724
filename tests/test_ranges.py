"""Binned interval join (operators/ranges.py): brute-force parity on a
random fixture, boundary semantics, the runaway-interval guard, and the
plan shape that motivates the operator."""

import numpy as np
import pytest
from pyspark.sql import Row

from datax_spark.operators.ranges import interval_join_binned


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(11)
    pts = [Row(pid=int(i), p=int(v)) for i, v in enumerate(rng.integers(0, 10_000, 400))]
    ivs = []
    for j in range(60):
        s = int(rng.integers(0, 9_800))
        ivs.append(Row(iid=j, s=s, e=s + int(rng.integers(1, 400))))
    return spark.createDataFrame(pts), spark.createDataFrame(ivs), pts, ivs


@pytest.mark.parametrize("bin_width", [50, 250, 5000])
def test_matches_brute_force_any_bin_width(spark, fixture, bin_width):
    """Result is bin_width-independent and equals the O(P·I) reference."""
    pts_df, ivs_df, pts, ivs = fixture
    got = {(r.pid, r.iid) for r in
           interval_join_binned(pts_df, ivs_df, "p", "s", "e", bin_width).collect()}
    want = {(p.pid, i.iid) for p in pts for i in ivs if i.s <= p.p < i.e}
    assert got == want


def test_end_inclusive_boundary(spark):
    pts = spark.createDataFrame([Row(pid=1, p=100)])
    ivs = spark.createDataFrame([Row(iid=1, s=50, e=100)])
    assert interval_join_binned(pts, ivs, "p", "s", "e", 64).count() == 0
    assert interval_join_binned(pts, ivs, "p", "s", "e", 64, end_inclusive=True).count() == 1


def test_runaway_interval_guard(spark):
    pts = spark.createDataFrame([Row(pid=1, p=5)])
    ivs = spark.createDataFrame([Row(iid=1, s=0, e=10_000_000)])
    with pytest.raises(Exception, match="spans >= 1024 bins"):
        interval_join_binned(pts, ivs, "p", "s", "e", 10).collect()


def test_ambiguous_columns_rejected(spark):
    df = spark.createDataFrame([Row(x=1, p=2, s=3, e=4)])
    with pytest.raises(ValueError, match="ambiguous columns"):
        interval_join_binned(df, df, "p", "s", "e", 10)


def test_plan_is_equi_join_not_nested_loop(spark, fixture):
    """The entire point: the containment predicate rides an equi-join on
    the bin key, never BroadcastNestedLoopJoin."""
    pts_df, ivs_df, _, _ = fixture
    plan = (interval_join_binned(pts_df, ivs_df, "p", "s", "e", 250)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
