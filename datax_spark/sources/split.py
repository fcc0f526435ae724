"""Split / parallelize planning — DataX's physical-execution math.

Re-expresses the reference's split operators as pure functions + Spark
predicates (SURVEY §2.5):

- pk_range_split: even BigInteger range slicing with remainder spreading
  and the NULL-pk tail slice (``plugin-rdbms-util/.../reader/util/
  SingleTableSplitUtil.java:35-129``, ``common/.../util/
  RangeSplitUtil.java:43-93`` doBigIntegerSplit).
- ascii_string_split: base-N bignum split over string pks
  (``RangeSplitUtil.java:14-30, 96-180``).
- quantile_split: sampled boundary split (the Oracle "Monte-Carlo" path,
  ``SingleTableSplitUtil.java:317-412``) via ``df.approxQuantile``.
- channel_plan: rate-budget → parallelism solver
  (``core/.../job/JobContainer.java:416-486`` adjustChannelNumber).
- split_id_expr: tags rows with their slice id — the testable algebraic
  core (the WHERE-clause generator follows from boundaries).

In Spark these feed ``spark.read.jdbc(predicates=...)`` or explicit
repartitioning; for file sources Spark's block-level splitting replaces
them outright (strictly finer-grained than DataX's one-task-per-file,
``txtfilereader/.../TxtFileReader.java:214-235``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def pk_range_split(min_pk: int, max_pk: int, n: int) -> list[tuple[int, int]]:
    """Even [lo, hi) slices of [min_pk, max_pk]; remainder spread one unit
    each to the first slices (left-closed right-open except the last slice
    which closes at max_pk+1). n<=0 or empty range → single slice."""
    if n <= 1 or max_pk <= min_pk:
        return [(min_pk, max_pk + 1)]
    total = max_pk - min_pk + 1
    base, rem = divmod(total, n)
    out = []
    lo = min_pk
    for i in range(n):
        width = base + (1 if i < rem else 0)
        if width == 0:
            continue
        out.append((lo, lo + width))
        lo += width
    return out


def split_predicates(col: str, slices: list[tuple[int, int]], with_null_tail: bool = True) -> list[str]:
    """SQL predicates per slice + the NULL tail slice the reference always
    appends (``SingleTableSplitUtil.java:100-129``)."""
    preds = [f"{col} >= {lo} AND {col} < {hi}" for lo, hi in slices]
    if with_null_tail:
        preds.append(f"{col} IS NULL")
    return preds


def split_id_expr(col: Column, min_pk: int, max_pk: int, n: int) -> Column:
    """Slice index for each row under pk_range_split — the algebraic dual
    of the predicate list (used for oracle-checked parity tests)."""
    slices = pk_range_split(min_pk, max_pk, n)
    expr = F.lit(None).cast("int")
    for i, (lo, hi) in reversed(list(enumerate(slices))):
        expr = F.when((col >= lo) & (col < hi), F.lit(i)).otherwise(expr)
    return expr


_ASCII_LO, _ASCII_HI = 32, 127  # printable range, base = HI-LO+1


def ascii_string_split(min_s: str, max_s: str, n: int, depth: int = 4) -> list[str]:
    """Boundary strings splitting [min_s, max_s] into n lexicographic
    ranges — the base-95 bignum midpoint construction of
    ``RangeSplitUtil.java:96-180`` (positions beyond ``depth`` ignored)."""
    base = _ASCII_HI - _ASCII_LO + 1

    def to_int(s: str) -> int:
        v = 0
        for i in range(depth):
            c = ord(s[i]) if i < len(s) else _ASCII_LO
            v = v * base + max(0, min(base - 1, c - _ASCII_LO))
        return v

    def to_str(v: int) -> str:
        digits = []
        for _ in range(depth):
            v, d = divmod(v, base)
            digits.append(chr(d + _ASCII_LO))
        return "".join(reversed(digits)).rstrip(" ")

    lo, hi = to_int(min_s), to_int(max_s)
    if n <= 1 or hi <= lo:
        return [min_s, max_s]
    bounds = [lo + (hi - lo) * i // n for i in range(n + 1)]
    return [to_str(b) for b in bounds]


def quantile_split(df: DataFrame, col: str, n: int, error: float = 0.01) -> list[float]:
    """Skew-aware boundaries from sampled quantiles — Spark-native
    replacement for the Oracle SAMPLE() sorted-sample split."""
    probs = [i / n for i in range(1, n)]
    return df.approxQuantile(col, probs, error)


def channel_plan(
    byte_limit: int | None = None,
    record_limit: int | None = None,
    channel_byte_speed: int = 1 << 20,
    channel_record_speed: int = 10000,
    explicit_channels: int | None = None,
) -> int:
    """needChannel = min(byteLimit/channelByte, recordLimit/channelRecord),
    else the explicit channel count (``JobContainer.java:416-486``). Maps
    to numPartitions / maxFilesPerTrigger in Spark."""
    candidates = []
    if byte_limit and byte_limit > 0:
        candidates.append(max(1, byte_limit // channel_byte_speed))
    if record_limit and record_limit > 0:
        candidates.append(max(1, record_limit // channel_record_speed))
    if candidates:
        return int(min(candidates))
    if explicit_channels and explicit_channels > 0:
        return explicit_channels
    raise ValueError("no rate limit nor explicit channel count configured")


def trigger_byte_budget(
    trigger_interval_sec: float,
    byte_limit_per_sec: int | None = None,
    channels: int | None = None,
    channel_byte_speed: int = 1 << 20,
) -> int:
    """Per-trigger byte budget — the reference's channel byte-rate
    throttle (``Channel.java:176-239``: ``byteSpeed`` bytes/sec per
    channel, enforced each statistics window by sleeping off the excess)
    mapped onto Spark's pull model: instead of sleeping after reading too
    much, bound what a micro-batch ADMITS via the file source's
    ``maxBytesPerTrigger``. Total rate = ``byte_limit_per_sec`` when the
    job sets a global cap (``job.setting.speed.byte``), else
    ``channels × channel_byte_speed`` (core.json
    ``core.transport.channel.speed.byte`` default 1 MiB/s)."""
    if byte_limit_per_sec and byte_limit_per_sec > 0:
        rate = byte_limit_per_sec
    elif channels and channels > 0:
        rate = channels * channel_byte_speed
    else:
        raise ValueError("need byte_limit_per_sec or channels for a byte budget")
    return max(1, int(rate * trigger_interval_sec))


def over_split_factor(n_tables: int, channels: int, split_factor: int = 5) -> int:
    """Tasks per source: single table over-splits ×splitFactor against
    stragglers (``ReaderSplitUtil.java:62-87``); AQE coalesces the excess."""
    if n_tables == 1:
        return channels * split_factor
    import math

    return math.ceil(channels / n_tables)
