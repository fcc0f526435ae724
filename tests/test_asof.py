"""as-of join (operators/asof.py): semantics vs a brute-force pandas
reference on adversarial fixtures — ties, duplicates, tolerance, both
directions, keys with no match."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from datax_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(id=1, k="a", ts=_ts("2024-01-01 10:00:00")),
            Row(id=2, k="a", ts=_ts("2024-01-01 12:00:00")),
            Row(id=3, k="a", ts=_ts("2024-01-01 12:30:00")),
            Row(id=4, k="b", ts=_ts("2024-01-01 09:00:00")),  # before any right row
            Row(id=5, k="c", ts=_ts("2024-01-01 09:00:00")),  # key absent on right
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=_ts("2024-01-01 09:00:00"), v=1, seq=1),
            Row(k="a", rts=_ts("2024-01-01 12:00:00"), v=2, seq=2),  # tie ts, dup below
            Row(k="a", rts=_ts("2024-01-01 12:00:00"), v=3, seq=3),  # dup wins by seq
            Row(k="b", rts=_ts("2024-01-01 11:00:00"), v=4, seq=4),
        ]
    )
    return left, right


def test_backward_inclusive_with_ties(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    payload_cols=["v"], right_tiebreak="seq")
    got = {r.id: r.v for r in out.collect()}
    # id=1: right@09:00 → v=1; id=2: tie at 12:00, inclusive, seq=3 wins → v=3
    # id=3: still v=3; id=4: no right row at-or-before → NULL; id=5: no key → NULL
    assert got == {1: 1, 2: 3, 3: 3, 4: None, 5: None}


def test_forward_direction(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    payload_cols=["v"], direction="forward", right_tiebreak="seq")
    got = {r.id: r.v for r in out.collect()}
    # id=1: earliest right at-or-after 10:00 is 12:00 (seq tie → 3)
    # id=3: nothing after 12:30 → NULL; id=4: 11:00 → v=4
    assert got == {1: 3, 2: 3, 3: None, 4: 4, 5: None}


def test_tolerance_bounds_match_age(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    payload_cols=["v"], right_tiebreak="seq",
                    tolerance_expr="INTERVAL 1 HOUR")
    got = {r.id: r.v for r in out.collect()}
    # id=1 matched right row is 1h old (09:00 vs 10:00) → still inside; make
    # sure a stale match (none here except id=1 exactly at the bound) survives
    # and id=2/3's fresh matches are untouched.
    assert got == {1: 1, 2: 3, 3: 3, 4: None, 5: None}

    out30 = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                      payload_cols=["v"], right_tiebreak="seq",
                      tolerance_expr="INTERVAL 30 MINUTES")
    got30 = {r.id: r.v for r in out30.collect()}
    # id=1's match is now too old (1h > 30m) → nulled; id=3's match is 30m old
    # (12:00 vs 12:30) → exactly at the bound, inclusive.
    assert got30 == {1: None, 2: 3, 3: 3, 4: None, 5: None}


def test_left_columns_preserved_and_row_count(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    payload_cols=["v", "seq"], right_tiebreak="seq")
    assert out.count() == left.count()  # left-outer: every left row survives
    assert set(out.columns) == {"id", "k", "ts", "v", "seq"}


def test_single_exchange_plan(frames):
    """The union-scan plan shuffles ONCE on the key — no join node, no
    second exchange (the point of the design at 100 TB)."""
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    payload_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
