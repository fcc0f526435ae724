"""ColumnCast parity tests — reproduce the reference cascade
(``ColumnCast.java:92-122,149-214``, defaults ``core.json``
``common.column.*``) including the GMT+8 default-timezone round-trip."""

import datetime

from pyspark.sql import functions as F

from datax_spark.functions.column_cast import (
    CastDefaults,
    bytes_to_string,
    date_cascade_failure_reason,
    string_to_bytes,
    string_to_timestamp,
    timestamp_to_string,
)


def _parse(spark, values, defaults=None, fmt=None):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    out = df.select(string_to_timestamp("s", defaults, fmt).alias("t")).collect()
    return [r["t"] for r in out]


def test_cascade_order_datetime_date_time_extra(spark):
    d = CastDefaults(extra_formats=("yyyy/MM/dd",))
    got = _parse(spark, [
        "2024-03-05 10:20:30",   # datetimeFormat
        "2024-03-05",            # dateFormat
        "10:20:30",              # timeFormat (epoch date, reference parity)
        "2024/03/05",            # extraFormats entry
    ], d)
    # all wall-clocks interpreted in GMT+8 → UTC instants 8h earlier
    assert got[0] == datetime.datetime(2024, 3, 5, 2, 20, 30)
    assert got[1] == datetime.datetime(2024, 3, 4, 16, 0, 0)
    assert got[2] == datetime.datetime(1970, 1, 1, 2, 20, 30)
    assert got[3] == datetime.datetime(2024, 3, 4, 16, 0, 0)


def test_gmt8_round_trip(spark):
    """string → Date in GMT+8 → string renders back byte-identical."""
    d = CastDefaults()
    df = spark.createDataFrame([("2024-03-05 10:20:30",)], "s string")
    out = df.select(
        timestamp_to_string(string_to_timestamp("s", d), "datetime", d).alias("rt"),
        timestamp_to_string(string_to_timestamp("s", d), "date", d).alias("rd"),
        timestamp_to_string(string_to_timestamp("s", d), "time", d).alias("rtm"),
    ).first()
    assert out["rt"] == "2024-03-05 10:20:30"
    assert out["rd"] == "2024-03-05"
    assert out["rtm"] == "10:20:30"


def test_explicit_format_overrides_cascade(spark):
    # the two-arg string2Date overload: ONLY the given format is tried
    got = _parse(spark, ["05.03.2024", "2024-03-05"], fmt="dd.MM.yyyy")
    assert got[0] == datetime.datetime(2024, 3, 4, 16, 0, 0)
    assert got[1] is None  # default format is NOT consulted


def test_configured_timezone_and_formats(spark):
    d = CastDefaults(datetime_format="MM/dd/yyyy HH:mm", time_zone="UTC")
    got = _parse(spark, ["03/05/2024 10:20"], d)
    assert got[0] == datetime.datetime(2024, 3, 5, 10, 20)


def test_cascade_exhausted_yields_null_and_reason(spark):
    df = spark.createDataFrame(
        [("not-a-date",), ("2024-03-05",), (None,)], "created string"
    )
    tagged = df.withColumn("_r", date_cascade_failure_reason(["created"]))
    rows = tagged.collect()
    assert rows[0]["_r"] == "date parse failure: created"
    assert rows[1]["_r"] is None
    assert rows[2]["_r"] is None  # NULL in → NULL out, not dirty


def test_from_config_nested_and_defaults():
    d = CastDefaults.from_config(None)
    assert d.time_zone == "GMT+8" and d.encoding == "UTF-8"
    d2 = CastDefaults.from_config(
        {"common": {"column": {
            "datetimeFormat": "yyyy-MM-dd'T'HH:mm:ss",
            "extraFormats": ["yyyyMMdd"],
            "timeZone": "GMT+0",
            "encoding": "UTF-16",
        }}}
    )
    assert d2.datetime_format == "yyyy-MM-dd'T'HH:mm:ss"
    assert d2.extra_formats == ("yyyyMMdd",)
    assert d2.time_zone == "GMT+0"
    assert d2.formats[0] == "yyyy-MM-dd'T'HH:mm:ss"


def test_bytes_string_encoding_round_trip(spark):
    d = CastDefaults(encoding="UTF-16")
    df = spark.createDataFrame([("héllo",)], "s string")
    out = df.select(
        bytes_to_string(string_to_bytes("s", d), d).alias("rt"),
        F.length(string_to_bytes("s", d)).alias("n"),
    ).first()
    assert out["rt"] == "héllo"
    assert out["n"] > 5  # really UTF-16 encoded, not UTF-8


def test_read_csv_multi_format_column(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("1,2024-03-05 10:20:30\n2,2024-03-05\n3,2024/03/05\n")
    from datax_spark.sources.files import read_csv

    d = CastDefaults(extra_formats=("yyyy/MM/dd",))
    df = read_csv(
        spark, str(p),
        columns=[{"index": 0, "type": "long", "name": "id"},
                 {"index": 1, "type": "date", "name": "created"}],
        cast_defaults=d,
    )
    rows = {r["id"]: r["created"] for r in df.collect()}
    assert rows[1] == datetime.datetime(2024, 3, 5, 2, 20, 30)
    assert rows[2] == datetime.datetime(2024, 3, 4, 16, 0, 0)
    assert rows[3] == datetime.datetime(2024, 3, 4, 16, 0, 0)


def test_job_config_common_column_block(spark, tmp_path):
    import json

    from datax_spark.config import JobConfig

    p = tmp_path / "in.csv"
    p.write_text("20240305,x\n")
    doc = {
        "job": {
            "content": [{
                "reader": {"name": "txtfilereader", "parameter": {
                    "path": str(p),
                    "column": [{"index": 0, "type": "date", "name": "d"},
                               {"index": 1, "type": "string", "name": "s"}],
                }},
                "writer": {"name": "parquetwriter", "parameter": {
                    "path": str(tmp_path / "out")}},
            }],
        },
        "common": {"column": {"extraFormats": ["yyyyMMdd"], "timeZone": "UTC"}},
    }
    cfg = JobConfig.from_json(json.dumps(doc))
    assert cfg.cast_defaults is not None
    assert cfg.cast_defaults.extra_formats == ("yyyyMMdd",)
    from datax_spark.config import _read

    out = _read(spark, cfg).collect()
    assert out[0]["d"] == datetime.datetime(2024, 3, 5, 0, 0, 0)
