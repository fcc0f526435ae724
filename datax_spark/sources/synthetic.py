"""Synthetic source — DataX streamreader parity.

The reference generates ``sliceRecordCount`` rows × channels of constant
or ``random(a,b)`` columns per type
(``streamreader/.../StreamReader.java:175-182 split, 222-231 loop,
241-307 per-type random``). Spark-first: ``spark.range(n)`` + literal /
hash-derived projections — distributed, deterministic (seeded via
xxhash64, unlike the reference's nondeterministic Random), and columnar.

Column spec (DataX job-config shape)::

    {"type": "string", "value": "DataX"}          # constant
    {"type": "long", "random": "0, 100"}          # uniform in [a, b]
    {"type": "date", "value": "2024-01-01 00:00:00"}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_source(
    spark: SparkSession,
    slice_record_count: int,
    columns: list[dict],
    channels: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Rows = slice_record_count × channels (reference multiplies per
    channel); columns per spec, deterministic."""
    n = slice_record_count * channels
    base = spark.range(0, n, 1, max(channels, 1))
    out = []
    for j, spec in enumerate(columns):
        ctype = spec.get("type", "string").lower()
        name = spec.get("name", f"c{j}")
        if "random" in spec:
            a, b = [int(x.strip()) for x in str(spec["random"]).split(",")]
            h = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + j)), F.lit(b - a + 1)) + a
            if ctype in {"long", "int"}:
                col = h.cast("bigint")
            elif ctype == "double":
                frac = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1000 + j)), F.lit(10**6)) / F.lit(10**6)
                col = (h + frac).cast("double")
            elif ctype == "bool":
                col = F.pmod(h, F.lit(2)) == 1
            elif ctype == "date":
                col = F.timestamp_seconds(F.lit(1704067200) + h)
            elif ctype == "string":
                col = F.concat(F.lit("str_"), h.cast("string"))
            elif ctype == "bytes":
                col = F.encode(F.concat(F.lit("b_"), h.cast("string")), "UTF-8")
            else:
                raise ValueError(f"streamreader: unsupported random type {ctype}")
        else:
            v = spec["value"]
            if ctype in {"long", "int"}:
                col = F.lit(int(v)).cast("bigint")
            elif ctype == "double":
                col = F.lit(float(v)).cast("double")
            elif ctype == "bool":
                col = F.lit(str(v).lower() == "true")
            elif ctype == "date":
                col = F.to_timestamp(F.lit(v))
            elif ctype == "bytes":
                col = F.encode(F.lit(str(v)), "UTF-8")
            else:
                col = F.lit(str(v))
        out.append(col.alias(name))
    return base.select(*out)
