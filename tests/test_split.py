"""Split math parity with the reference's range-split semantics."""

import pytest
from pyspark.sql import functions as F

from datax_spark.sources.split import (
    ascii_string_split,
    channel_plan,
    over_split_factor,
    pk_range_split,
    split_id_expr,
    split_predicates,
)


def test_even_split_with_remainder_spread():
    # total=11, n=4 → widths 3,3,3,2 (remainder to the first slices,
    # RangeSplitUtil.doBigIntegerSplit semantics)
    s = pk_range_split(0, 10, 4)
    widths = [hi - lo for lo, hi in s]
    assert widths == [3, 3, 3, 2]
    assert s[0][0] == 0 and s[-1][1] == 11
    # contiguous, non-overlapping
    for (a, b), (c, d) in zip(s, s[1:]):
        assert b == c


def test_split_degenerate_cases():
    assert pk_range_split(5, 5, 4) == [(5, 6)]
    assert pk_range_split(0, 100, 1) == [(0, 101)]
    # n > range: empty slices dropped
    s = pk_range_split(0, 2, 10)
    assert [hi - lo for lo, hi in s] == [1, 1, 1]


def test_null_tail_predicate():
    preds = split_predicates("pk", pk_range_split(0, 9, 2))
    assert preds[-1] == "pk IS NULL"
    assert "pk >= 0 AND pk < 5" in preds[0]


def test_split_id_expr_matches_closed_formula(spark):
    # closed form of the front-loaded remainder split: offset<rem*(base+1)
    # → offset/(base+1), else rem + (offset-rem*(base+1))/base
    n, mn, mx = 8, 17, 9876
    total = mx - mn + 1
    base, rem = divmod(total, n)
    df = spark.range(mn, mx + 1).select(F.col("id"))
    off = F.col("id") - mn
    closed = F.when(
        off < rem * (base + 1), F.floor(off / (base + 1))
    ).otherwise(rem + F.floor((off - rem * (base + 1)) / base)).cast("int")
    got = df.select(split_id_expr(F.col("id"), mn, mx, n).alias("a"), closed.alias("b"))
    assert got.filter("a <> b").count() == 0


def test_ascii_string_split_monotonic():
    bounds = ascii_string_split("aaa", "zzz", 5)
    assert len(bounds) == 6
    assert bounds == sorted(bounds)
    assert bounds[0].startswith("a") and bounds[-1].startswith("z")


def test_channel_plan():
    # byte-budget limited
    assert channel_plan(byte_limit=10 << 20, channel_byte_speed=1 << 20) == 10
    # min of byte and record budgets
    assert channel_plan(byte_limit=10 << 20, record_limit=30000,
                        channel_byte_speed=1 << 20, channel_record_speed=10000) == 3
    assert channel_plan(explicit_channels=7) == 7
    with pytest.raises(ValueError):
        channel_plan()


def test_over_split_factor():
    assert over_split_factor(1, 4) == 20  # single table ×5
    assert over_split_factor(32, 16) == 1
