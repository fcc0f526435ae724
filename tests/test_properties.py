"""Property-based tests (hypothesis): the LWW change algebra against a
python dict-replay oracle, dx_* transformer parity against python string
ops, and a hot-key skew merge. These mirror the reference's
transformer/unit test strategy (SURVEY §5) but sweep generated inputs
instead of fixed fixtures."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from datax_spark.lake.merge import lww_dedup, merge_into
from datax_spark.lake.table import LakeTable

# ------------------------------------------------------------ lww algebra

# ops over a tiny key space with colliding timestamps → dense conflicts
_EVENTS = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=3),     # key
        st.integers(min_value=0, max_value=5),     # ts bucket (collisions!)
        st.integers(min_value=0, max_value=100),   # payload
    ),
    min_size=1,
    max_size=40,
)


def _dict_replay(events):
    """Python oracle: LWW by (ts, lsn) per key, D = tombstone."""
    state = {}
    for lsn, (op, key, ts, val) in enumerate(events):
        cur = state.get(key)
        if cur is None or (ts, lsn) > (cur[0], cur[1]):
            state[key] = (ts, lsn, op, val)
    return {
        k: (lsn, v)
        for k, (ts, lsn, op, v) in state.items()
        if op != "D"
    }


@given(_EVENTS)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_lww_dedup_matches_dict_replay(spark, events):
    rows = [
        (lsn, op, key, 1704067200 + ts, val)
        for lsn, (op, key, ts, val) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "lsn long, op string, url long, ts_s long, val long"
    ).withColumn("warc_ts", F.timestamp_seconds("ts_s")).drop("ts_s")
    win = lww_dedup(df, "url", "warc_ts", "lsn")
    got = {
        r["url"]: (r["lsn"], r["val"])
        for r in win.filter(F.col("op") != "D").collect()
    }
    assert got == _dict_replay(events)


# --------------------------------------------------------- dx_* vs python

_TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=30,
)


@given(_TEXT, st.integers(0, 10), st.integers(0, 10))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_dx_substr_matches_python(spark, s, start, length):
    from datax_spark.functions.transformers import dx_substr

    got = (
        spark.createDataFrame([(s,)], "v string")
        .select(dx_substr(F.col("v"), start, length).alias("o"))
        .first()["o"]
    )
    assert got == s[start : start + length]


@given(_TEXT, st.integers(0, 10), st.integers(0, 6), _TEXT.filter(lambda r: len(r) <= 5))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_dx_replace_matches_python(spark, s, start, length, repl):
    from datax_spark.functions.transformers import dx_replace

    got = (
        spark.createDataFrame([(s,)], "v string")
        .select(dx_replace(F.col("v"), start, length, repl).alias("o"))
        .first()["o"]
    )
    # reference splice semantics: [0,start) + repl + [start+length,)
    assert got == s[:start] + repl + s[start + length :]


# ------------------------------------------------------------ hot-key skew

@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_hot_key_skew_merge(spark, tmp_path, mode):
    """90% of a 100k-event batch hits ONE key (the hot-url case the
    north star calls out). The hash-agg dedup's map-side combine must
    absorb it — merge completes and converges to the LWW winner."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / mode), schema, key_col="url", num_buckets=4)
    n = 100_000
    ch = spark.range(n).select(
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
        F.when(F.col("id") % 10 < 9, F.lit("https://hot/page"))
        .otherwise(F.concat(F.lit("https://cold/"), (F.col("id") % 997).cast("string")))
        .alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("warc_ts"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("lang"),
    ).repartition(8)
    merge_into(t, ch, merge_mode=mode)
    rows = t.read().collect()
    # 1 hot key + ≤997 cold keys survive, hot key holds the max-lsn value
    hot = [r for r in rows if r["url"] == "https://hot/page"]
    assert len(hot) == 1
    # the winner is the event with max (warc_ts, lsn) among hot events:
    # ids ≡ 0..8 (mod 10) → max id with id%10<9 is n-2
    assert hot[0]["lang"] == f"v{n - 2}"
    assert 1 <= len(rows) <= 998
