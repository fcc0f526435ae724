"""Engine-boundary conf pinning (VERDICT r5 "What's wrong" #1/#2).

Two independent incidents showed correctness surfaces silently depending
on the SESSION the caller happens to hold: a bare
``SparkSession.builder.getOrCreate()`` leaves parquet timestamps on
legacy INT96, whose footers carry NO column statistics, so zone-map
capture records nothing and ``events_zone_scan``'s prune assertion fires
under the driver's gate. The fix under test: ``ensure_engine_confs``
pins the correctness-critical runtime SQL confs inside the engine write
path itself (``LakeTable.write_data_files``), so ANY session — however
bare — produces stats-bearing files.

The bare-session case runs in a SUBPROCESS so the JVM truly starts with
stock confs (the suite's shared session already carries the factory's
pins and would mask the regression).
"""

import datetime
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BARE_RUNNER = """
import datetime, json, sys
from pyspark.sql import SparkSession, functions as F, types as T

# deliberately BARE: no engine factory, no confs — the driver gate's shape
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
sys.path.insert(0, %(repo)r)
from datax_spark.lake.merge import bulk_load
from datax_spark.lake.table import LakeTable

base = datetime.datetime(2024, 1, 1)
rows = [(i, base + datetime.timedelta(hours=i), float(i)) for i in range(240)]
df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, value double")
schema = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("value", T.DoubleType(), True),
])
root = sys.argv[1]
table = LakeTable.create(spark, root, schema, key_col="event_id", num_buckets=4)
bulk_load(table, df)
table.cluster_by("ts", max_records_per_file=20)
kept, pruned = table.zone_prune_plan(
    datetime.datetime(2024, 1, 2), datetime.datetime(2024, 1, 3))
n_match = table.scan_zone(
    datetime.datetime(2024, 1, 2), datetime.datetime(2024, 1, 3)).count()
n_full = table.read().filter(
    (F.col("ts") >= F.lit(datetime.datetime(2024, 1, 2)))
    & (F.col("ts") <= F.lit(datetime.datetime(2024, 1, 3)))).count()
print("BARE_ZONE " + json.dumps({
    "kept": len(kept), "pruned": len(pruned),
    "scan_rows": n_match, "full_rows": n_full,
    "ts_type": spark.conf.get("spark.sql.parquet.outputTimestampType"),
}))
"""


def test_bare_session_zone_capture_and_prune(tmp_path):
    """A stock getOrCreate session must still capture zone stats and
    prune — the exact scenario of the r5 red driver row."""
    script = BARE_RUNNER % {"repo": REPO}
    env = {k: v for k, v in os.environ.items() if not k.startswith("PYSPARK")}
    proc = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "t")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("BARE_ZONE ")]
    assert line, proc.stdout[-2000:]
    res = json.loads(line[0].split(" ", 1)[1])
    assert res["pruned"] > 0, f"no files pruned under bare session: {res}"
    assert res["scan_rows"] == res["full_rows"] == 25, res
    # write_data_files pinned the conf on the bare session
    assert res["ts_type"] == "TIMESTAMP_MICROS", res


def test_ensure_engine_confs_idempotent(spark):
    from datax_spark.session import ENGINE_CORRECTNESS_CONFS, ensure_engine_confs

    ensure_engine_confs(spark)
    for k, v in ENGINE_CORRECTNESS_CONFS.items():
        assert spark.conf.get(k) == v
    ensure_engine_confs(spark)  # second call: no-op, no error
    for k, v in ENGINE_CORRECTNESS_CONFS.items():
        assert spark.conf.get(k) == v


def test_bare_session_zone_capture_non_utc_host(tmp_path):
    """Same bare-session scenario with TZ=Asia/Tokyo for the whole
    python+JVM process: naive datetime bounds now convert host-local →
    UTC inside zone_prune_plan (PySpark's lit() uses the process tz),
    and scan_zone must still agree exactly with the full filter."""
    script = BARE_RUNNER % {"repo": REPO}
    env = {k: v for k, v in os.environ.items() if not k.startswith("PYSPARK")}
    env["TZ"] = "Asia/Tokyo"
    proc = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "t")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("BARE_ZONE ")]
    assert line, proc.stdout[-2000:]
    res = json.loads(line[0].split(" ", 1)[1])
    assert res["pruned"] > 0, f"no files pruned under Tokyo host tz: {res}"
    assert res["scan_rows"] == res["full_rows"] == 25, res


def test_zone_prune_non_utc_session_bounds(spark, tmp_path):
    """ADVICE r5 follow-up, contract form: whatever the session
    timezone, scan_zone(lo, hi) must return exactly the rows of
    read().filter(between(lo, hi)). (Measured while fixing this:
    PySpark's lit(naive datetime) converts via the process-local tz,
    NOT the session tz, so a non-UTC SESSION does not shift the filter —
    only a non-UTC HOST does, covered by the subprocess test above.)"""
    from pyspark.sql import functions as F, types as T

    from datax_spark.lake.merge import bulk_load
    from datax_spark.lake.table import LakeTable

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(hours=i), float(i)) for i in range(48)]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, value double")
    schema = T.StructType([
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
    ])
    root = str(tmp_path / "tz")
    table = LakeTable.create(spark, root, schema, key_col="event_id", num_buckets=2)
    bulk_load(table, df)
    table.cluster_by("ts", max_records_per_file=6)  # ~6h per file zone
    lo = datetime.datetime(2024, 1, 1, 12)
    hi = datetime.datetime(2024, 1, 1, 20)
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # +9h offset: bounds shift by more than one file's zone width
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        n_zone = table.scan_zone(lo, hi).count()
        n_full = table.read().filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))).count()
        assert n_zone == n_full == 9, (n_zone, n_full)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_zone_key_exact_integer_micros():
    """_zone_key must be bit-exact integer micros, not float-truncated."""
    from datax_spark.lake.table import _zone_key

    v = datetime.datetime(2024, 5, 17, 3, 4, 5, 123457)
    exact = (v - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
        microseconds=1)
    assert _zone_key(v) == exact
    aware = v.replace(tzinfo=datetime.timezone.utc)
    assert _zone_key(aware) == exact
