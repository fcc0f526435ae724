"""Distributed as-of (point-in-time) join.

The staple of CDC/feature-store pipelines: enrich each left row
(key, ts) with the most recent right row for the same key at or before
ts (``direction="backward"``; ``"forward"`` = earliest at-or-after).
Spark has no built-in ASOF JOIN (pandas has ``merge_asof``; DuckDB has
``ASOF JOIN``, which is this operator's oracle).

Implementation — the UNION-scan plan, not a join:

    left  → (key, ts, _side=0, payload=NULL)
    right → (key, ts, _side=1, payload=struct(...))
    union → window last(payload, ignorenulls=True)
              over (partition by key
                    order by ts, _side DESC   ← right wins ties (inclusive)
                    rows unbounded preceding → current)
    filter _side=0 → unpack payload

Cost model: ONE exchange + sort on the key over |L|+|R| narrow rows —
the same shuffle a plain equi-join would pay, but with no O(matches)
intermediate blow-up: a naive ``join + filter ts_r <= ts + max_by``
materializes every (left, right-history) pair before reducing, which at
100 TB with long key histories is quadratic in history length. The
union plan is linear and AQE handles moderate key skew; a pathological
single hot key can additionally be range-split by ts with boundary
replication (documented, not needed at current scales).

Reference parity: DataX has no relational algebra — engine-added
surface (SURVEY §2.8 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAY = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_expr: str | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left-outer as-of join: every left row survives, enriched with the
    nearest right row's ``payload_cols`` (NULLs when none qualifies).

    ``right_tiebreak``: column ordering concurrent right rows at the same
    (key, ts) — the greatest wins (required when (key, ts) is not unique,
    otherwise the winner would be nondeterministic).
    ``tolerance_expr``: SQL interval/number expression; matches older
    (backward) / newer (forward) than ``ts ± tolerance`` are nulled out.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload_cols = payload_cols or [c for c in right.columns if c not in (*on, right_ts)]

    # NULL-timestamp semantics (match pandas merge_asof / DuckDB ASOF):
    # right rows with a null ts can never be "nearest" — drop them before
    # the union, else they'd sort first under asc and match as
    # before-everything; left rows with a null ts match nothing — carry
    # them around the window and re-attach with NULL payloads.
    right = right.filter(F.col(right_ts).isNotNull())
    null_left = left.filter(F.col(left_ts).isNull())
    left = left.filter(F.col(left_ts).isNotNull())

    # Deduplicate concurrent right rows per (key, ts): exact same LWW
    # hash-aggregate shape as lake/merge.py (partial max before exchange).
    if right_tiebreak is not None:
        fields = [right_tiebreak] + [c for c in payload_cols if c != right_tiebreak]
        pay = F.max(F.struct(*[F.col(c) for c in fields]))
        r = (right.groupBy(*on, right_ts)
             .agg(pay.alias(_PAY))
             .select(*on, F.col(right_ts).alias(_TS),
                     F.struct(F.col(right_ts).alias(_TS),
                              *[F.col(f"{_PAY}.{c}").alias(c) for c in payload_cols]).alias(_PAY)))
    else:
        r = right.select(
            *on, F.col(right_ts).alias(_TS),
            F.struct(F.col(right_ts).alias(_TS),
                     *[F.col(c) for c in payload_cols]).alias(_PAY))

    l = left.select("*", F.col(left_ts).alias(_TS))
    lu = l.select(*on, F.col(_TS), F.lit(0).alias(_SIDE),
                  F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
                  F.struct(*[F.col(c) for c in left.columns]).alias("__asof_left"))
    ru = r.select(*on, F.col(_TS), F.lit(1).alias(_SIDE), F.col(_PAY),
                  F.lit(None).cast(lu.schema["__asof_left"].dataType).alias("__asof_left"))

    if direction == "backward":
        # ts ascending, right rows sort BEFORE left rows at equal ts
        w = Window.partitionBy(*on).orderBy(F.col(_TS).asc(), F.col(_SIDE).desc())
        pick = F.last(_PAY, ignorenulls=True)
    else:
        # ts descending: the first right row at-or-after is the last seen
        w = Window.partitionBy(*on).orderBy(F.col(_TS).desc(), F.col(_SIDE).desc())
        pick = F.last(_PAY, ignorenulls=True)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched = lu.unionByName(ru).withColumn(_PAY, pick.over(w)).filter(F.col(_SIDE) == 0)

    if tolerance_expr is not None:
        bound = (F.col(_TS) - F.expr(tolerance_expr) if direction == "backward"
                 else F.col(_TS) + F.expr(tolerance_expr))
        ok = (F.col(f"{_PAY}.{_TS}") >= bound if direction == "backward"
              else F.col(f"{_PAY}.{_TS}") <= bound)
        matched = matched.withColumn(_PAY, F.when(ok, F.col(_PAY)))

    out_left = [F.col(f"__asof_left.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"{_PAY}.{c}").alias(c) for c in payload_cols]
    out = matched.select(*out_left, *out_right)
    unmatched = null_left.select(
        "*", *[F.lit(None).cast(dict(out.dtypes)[c]).alias(c) for c in payload_cols])
    return out.unionByName(unmatched)
