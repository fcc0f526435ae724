"""DataX transformer parity library (the "T" surface) + registry.

Re-expresses the five built-in dx_* row transformers and the chain
executor semantics as DataFrame column operations (declarative — Catalyst
folds the whole chain into one projection, vs the reference's per-record
Java loop on the reader thread,
``core/.../exchanger/TransformerExchanger.java:53-127``).

Parity notes (documented behaviors, reference file:line):
- dx_substr (``core/.../transformer/SubstrTransformer.java:21-64``):
  null passes through; clamps to end of string.
- dx_pad (``PadTransformer.java:21-89``): 'l'/'r' pad to target length;
  longer input truncated from the LEFT-kept prefix; null treated as "".
- dx_replace (``ReplaceTransformer.java:21-65``): splice-replace the range
  [start, start+length) with replaceStr.
- dx_filter (``FilterTransformer.java:20-311``): match ⇒ DROP the row
  (inverted polarity!); 'like' is Java full-String#matches regex, mapped
  to rlike anchored ^…$.
- dx_digest (``DigestTransformer.java:32-85``): md5/sha1 hex of the column
  as string, null → digest of "", with upper/lower folding.

A chain is a list of (name, args) applied in order; a filter stops
subsequent transforms for dropped rows by construction (rows are gone).
Custom transformers register via ``register_transformer`` — the SPI
analogue of ``TransformerRegistry.java:67-105`` jar loading.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


def dx_substr(col, start: int, length: int) -> Column:
    """substring [start, start+length), clamped to end; null → null."""
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.substring(col.cast("string"), start + 1, length)
    )


def dx_pad(col, side: str, target_len: int, pad_str: str) -> Column:
    """lpad/rpad to target_len; longer values truncated; null → ''. """
    s = F.coalesce(col.cast("string"), F.lit(""))
    if side.lower() == "l":
        return F.lpad(s, target_len, pad_str)
    return F.rpad(s, target_len, pad_str)


def dx_replace(col, start: int, length: int, replace_str: str) -> Column:
    """splice-replace chars [start, start+length) with replace_str."""
    s = col.cast("string")
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            F.substring(s, 1, start),
            F.lit(replace_str),
            F.when(F.length(s) > start + length,
                   F.substring(s, start + length + 1, 2**31 - 1 - (start + length))
                   ).otherwise(F.lit("")),
        )
    )


_FILTER_OPS = {">", "<", "=", "!=", ">=", "<="}


def _filter_operands(col, value, data_type):
    """(target, lit) with the reference's TYPE-dispatched compare mode
    (``FilterTransformer.java:78-127``): Double column → double compare,
    Long/Date column → long compare (``Long.parseLong`` — a non-integer
    filter value raises, as in the reference), everything else (string/
    bytes/bool) → lexicographic STRING compare even for numeric-looking
    values. ``data_type=None`` falls back to a value-parse heuristic for
    direct Column calls that carry no schema."""
    from pyspark.sql import types as T

    if data_type is not None:
        if isinstance(data_type, (T.DoubleType, T.FloatType, T.DecimalType)):
            return col.cast("double"), F.lit(float(value))
        if isinstance(data_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return col.cast("long"), F.lit(int(str(value)))
        if isinstance(data_type, (T.DateType, T.TimestampType)):
            # DateColumn.asLong is epoch MILLIS in the reference
            return F.unix_millis(col.cast("timestamp")), F.lit(int(str(value)))
        return col.cast("string"), F.lit(str(value))
    try:
        return col.cast("double"), F.lit(float(value))
    except (TypeError, ValueError):
        return col.cast("string"), F.lit(value)


def dx_filter_cond(col, op: str, value, data_type=None) -> Column:
    """The MATCH condition (a matching row is DROPPED by the chain).

    Null semantics per the reference (``FilterTransformer.java``):
    - ``>``/``<``/``>=``/``<=``: null never matches (row kept, :75,:135)
    - ``=``: null matches only the literal value "null" (:206-212)
    - ``!=``: null MATCHES (dropped) unless value is "null" (:256-262)
    - ``like``: null never matches (:296)
    - ``not like``: null MATCHES — the reference drops null rows (:305-308)
    """
    if op == "like":
        return col.cast("string").rlike(f"^(?:{value})$")
    if op == "not like":
        return col.isNull() | ~col.cast("string").rlike(f"^(?:{value})$")
    if op not in _FILTER_OPS:
        raise ValueError(f"dx_filter: unknown op {op!r}")
    if str(value).lower() == "null" and op in ("=", "!="):
        # null-literal test resolved BEFORE operand parsing — a numeric
        # column can't parse 'null' (the reference would throw per-record
        # in its typed branch, FilterTransformer.java:226; here the
        # null-test is the only sensible whole-column semantics). String
        # columns additionally compare against the literal text "null".
        from pyspark.sql import types as T

        stringy = data_type is None or isinstance(
            data_type, (T.StringType, T.BinaryType, T.BooleanType)
        )
        if op == "=":
            # match (drop) null rows; string rows equal to the text "null" too
            return col.isNull() | ((col.cast("string") == "null") if stringy else F.lit(False))
        # '!=': null rows never match (kept, reference :257); non-null
        # string rows match when their text differs from "null"
        return (
            (col.isNotNull() & (col.cast("string") != "null"))
            if stringy
            else F.lit(False)
        )
    target, lit = _filter_operands(col, value, data_type)
    if op == "=":
        return target == lit
    if op == "!=":
        return col.isNull() | (target != lit)  # null rows are dropped by '!='
    return {
        ">": target > lit,
        "<": target < lit,
        ">=": target >= lit,
        "<=": target <= lit,
    }[op]


def dx_filter(df: DataFrame, column: str, op: str, value) -> DataFrame:
    """Apply the filter transformer: matching rows are dropped. Compare
    mode dispatches on the column's schema type, as the reference does."""
    cond = dx_filter_cond(F.col(column), op, value, data_type=df.schema[column].dataType)
    return df.filter(~F.coalesce(cond, F.lit(False)))


def dx_digest(col, algo: str = "md5", case: str = "toLowerCase") -> Column:
    s = F.coalesce(col.cast("string"), F.lit(""))
    if algo.lower() == "md5":
        d = F.md5(F.encode(s, "UTF-8"))
    elif algo.lower() == "sha1":
        d = F.sha1(F.encode(s, "UTF-8"))
    else:
        raise ValueError(f"dx_digest: unknown algo {algo!r}")
    return F.upper(d) if case == "toUpperCase" else F.lower(d)


# ---------------------------------------------------------------- registry
# name -> callable(df, column, *args) -> DataFrame   (filter-style)
#      or callable(col, *args) -> Column             (projection-style)
_COLUMN_TRANSFORMERS: dict[str, Callable] = {
    "dx_substr": dx_substr,
    "dx_pad": dx_pad,
    "dx_replace": dx_replace,
    "dx_digest": dx_digest,
}
_ROW_TRANSFORMERS: dict[str, Callable] = {"dx_filter": dx_filter}


def register_transformer(name: str, fn: Callable, row_level: bool = False) -> None:
    """SPI registration (``TransformerRegistry.java:149-165`` reserves the
    dx_ namespace for builtins — enforced here too)."""
    if name.startswith("dx_") and name in (_COLUMN_TRANSFORMERS | _ROW_TRANSFORMERS):
        raise ValueError(f"builtin transformer name reserved: {name}")
    (_ROW_TRANSFORMERS if row_level else _COLUMN_TRANSFORMERS)[name] = fn


def apply_chain(df: DataFrame, chain: list[dict]) -> DataFrame:
    """Apply a DataX-style transformer chain:
    ``[{"name": "dx_substr", "column": "c0", "paras": [0, 5]}, ...]``
    (job-config shape of ``job.content[].transformer[]``). Catalyst
    collapses consecutive projections into a single stage."""
    for step in chain:
        name, colname = step["name"], step["column"]
        paras = step.get("paras", [])
        if name in _ROW_TRANSFORMERS:
            df = _ROW_TRANSFORMERS[name](df, colname, *paras)
        elif name in _COLUMN_TRANSFORMERS:
            df = df.withColumn(colname, _COLUMN_TRANSFORMERS[name](F.col(colname), *paras))
        else:
            raise KeyError(f"unknown transformer {name!r}")
    return df
