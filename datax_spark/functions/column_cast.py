"""ColumnCast parity — DataX's configurable string↔date/bytes cast matrix.

Reference semantics (``common/src/main/java/com/alibaba/datax/common/
element/ColumnCast.java``):

- string→Date (``StringCast.asDate``, :92-122): try ``datetimeFormat``,
  then ``dateFormat``, then ``timeFormat``, then each ``extraFormats``
  entry, all interpreted in ``common.column.timeZone`` (default GMT+8);
  only when every format fails is the value a conversion error.
- Date→string (``DateCast.asString``, :149-214): format by sub-type
  (DATE/TIME/DATETIME) in the configured timeZone.
- bytes↔string (``BytesCast``/``StringCast.asBytes``): configured
  ``common.column.encoding`` (default UTF-8).
- Defaults live in ``core/src/main/conf/core.json`` under
  ``common.column.*``.

Spark-first shape: the cascade is a ``coalesce`` of ``try_to_timestamp``
attempts — pure JVM expressions inside whole-stage codegen, no UDF; a
value that fails every format yields NULL, which
:func:`cast_cascade_failure_reason` converts into a quarantine reason
(the engine's dirty-record analog of the reference's ParseException).

Timezone note: ``to_utc_timestamp(parsed, tz)`` re-interprets the parsed
wall-clock as ``tz``-local. The engine pins the Spark session to UTC
(datax_spark.session), which makes this exactly the reference's
``FastDateFormat.getInstance(fmt, timeZoner)`` behavior.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, functions as F

_SUB_TYPES = ("date", "time", "datetime")


@dataclass(frozen=True)
class CastDefaults:
    """``common.column.*`` knobs (core.json defaults)."""

    datetime_format: str = "yyyy-MM-dd HH:mm:ss"
    date_format: str = "yyyy-MM-dd"
    time_format: str = "HH:mm:ss"
    extra_formats: tuple[str, ...] = field(default_factory=tuple)
    time_zone: str = "GMT+8"
    encoding: str = "UTF-8"

    @classmethod
    def from_config(cls, cfg: dict | None) -> "CastDefaults":
        """Accepts the DataX job/core config shape: either the nested
        ``{"common": {"column": {...}}}`` document or the inner
        ``{"datetimeFormat": ...}`` mapping directly."""
        if not cfg:
            return cls()
        col = cfg.get("common", {}).get("column", cfg) if isinstance(cfg, dict) else {}
        return cls(
            datetime_format=col.get("datetimeFormat", cls.datetime_format),
            date_format=col.get("dateFormat", cls.date_format),
            time_format=col.get("timeFormat", cls.time_format),
            extra_formats=tuple(col.get("extraFormats", ()) or ()),
            time_zone=col.get("timeZone", cls.time_zone),
            encoding=col.get("encoding", cls.encoding),
        )

    @property
    def formats(self) -> tuple[str, ...]:
        return (self.datetime_format, self.date_format, self.time_format,
                *self.extra_formats)


def string_to_timestamp(
    col: Column | str,
    defaults: CastDefaults | None = None,
    fmt: str | None = None,
) -> Column:
    """``ColumnCast.string2Date``: multi-format cascade (or the single
    explicit ``fmt``, the reference's two-arg overload), wall-clock
    interpreted in ``defaults.time_zone``. NULL in → NULL out; parse
    failure on every format → NULL (route with
    :func:`cast_cascade_failure_reason`)."""
    d = defaults or CastDefaults()
    c = F.col(col) if isinstance(col, str) else col
    attempts = (fmt,) if fmt else d.formats
    parsed = F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in attempts]) \
        if len(attempts) > 1 else F.try_to_timestamp(c, F.lit(attempts[0]))
    return F.to_utc_timestamp(parsed, d.time_zone)


def timestamp_to_string(
    col: Column | str,
    sub_type: str = "datetime",
    defaults: CastDefaults | None = None,
) -> Column:
    """``DateCast.asString``: render in the configured timeZone by
    sub-type (DATE/TIME/DATETIME — the reference rejects others)."""
    if sub_type not in _SUB_TYPES:
        raise ValueError(f"unsupported date sub-type {sub_type!r} (date/time/datetime)")
    d = defaults or CastDefaults()
    fmt = {"date": d.date_format, "time": d.time_format,
           "datetime": d.datetime_format}[sub_type]
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.from_utc_timestamp(c, d.time_zone), fmt)


def string_to_bytes(col: Column | str, defaults: CastDefaults | None = None) -> Column:
    d = defaults or CastDefaults()
    c = F.col(col) if isinstance(col, str) else col
    return F.encode(c, d.encoding)


def bytes_to_string(col: Column | str, defaults: CastDefaults | None = None) -> Column:
    d = defaults or CastDefaults()
    c = F.col(col) if isinstance(col, str) else col
    return F.decode(c, d.encoding)


def date_cascade_failure_reason(
    cols: list[str],
    defaults: CastDefaults | None = None,
    fmts: dict[str, str] | None = None,
) -> Column:
    """NULL ⇒ every listed string column parses through the cascade;
    else the first failing column's reason — the dirty-record analog of
    the reference's ParseException (same shape as
    :func:`datax_spark.quarantine.cast_failure_reason`, composes with
    ``_split_on_reason``/``split_dirty``)."""
    clauses = []
    for c in cols:
        parsed = string_to_timestamp(F.col(c), defaults, (fmts or {}).get(c))
        bad = F.col(c).isNotNull() & parsed.isNull()
        clauses.append(F.when(bad, F.lit(f"date parse failure: {c}")))
    if not clauses:
        return F.lit(None).cast("string")
    return F.coalesce(*clauses, F.lit(None).cast("string"))
