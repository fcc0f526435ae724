"""SCD Type 2 history: pure snapshot semantics + incremental Scd2Table
convergence under arbitrary batch splits, delivery orders, fold points,
and pathological delete sequences (D-first, D-after-D, late arrivals
that re-slot between deletes)."""

import datetime as dt
import itertools

import pytest
from pyspark.sql import functions as F, types as T

from datax_spark.cdc.scd2 import Scd2Table, scd2_snapshot

CH = "k string, ts timestamp, lsn long, op string, v string"


def _t(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _feed(spark, rows):
    return spark.createDataFrame(
        [(k, _t(d), lsn, op, v) for (k, d, lsn, op, v) in rows], CH
    )


def _df_set(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def _assert_same(a, b):
    assert _df_set(a) == _df_set(b)


def test_snapshot_intervals_exact(spark):
    """I,U,U,D then re-insert: intervals left-closed right-open, delete
    leaves a hole, re-insert opens the current version."""
    ch = _feed(spark, [
        ("a", 1, 10, "I", "v1"),
        ("a", 3, 11, "U", "v2"),
        ("a", 5, 12, "U", "v3"),
        ("a", 7, 13, "D", None),
        ("a", 9, 14, "I", "v4"),
        ("b", 2, 20, "I", "w1"),
    ])
    got = {
        (r["valid_from_lsn"]): (
            r["k"], r["v"],
            r["valid_to_lsn"], r["is_current"],
        )
        for r in scd2_snapshot(ch, "k").collect()
    }
    assert got == {
        10: ("a", "v1", 11, 0),
        11: ("a", "v2", 12, 0),
        12: ("a", "v3", 13, 0),   # closed by the delete
        14: ("a", "v4", None, 1), # re-opened after the delete
        20: ("b", "w1", None, 1),
    }
    # the delete row itself produced no interval; hole at day 7..9
    snap = scd2_snapshot(ch, "k")
    at = lambda d: snap.where(
        (F.col("valid_from_ts") <= F.lit(_t(d)))
        & (F.col("valid_to_ts").isNull() | (F.col("valid_to_ts") > F.lit(_t(d))))
    )
    assert [r["v"] for r in at(6).where(F.col("k") == "a").collect()] == ["v3"]
    assert at(8).where(F.col("k") == "a").count() == 0  # deleted
    assert [r["v"] for r in at(9).where(F.col("k") == "a").collect()] == ["v4"]


def test_snapshot_duplicate_delivery_collapses(spark):
    ch = _feed(spark, [("a", 1, 10, "I", "v1"), ("a", 3, 11, "U", "v2")])
    dup = ch.unionByName(ch)  # at-least-once delivery
    _assert_same(scd2_snapshot(dup, "k"), scd2_snapshot(ch, "k"))


ROWS = [
    ("a", 1, 10, "I", "v1"),
    ("a", 3, 11, "U", "v2"),
    ("a", 7, 13, "D", None),
    ("a", 9, 14, "I", "v4"),
    ("b", 2, 20, "I", "w1"),
    ("b", 4, 21, "D", None),
    ("b", 6, 22, "D", None),   # D-after-D: dangling delete
    ("c", 5, 30, "D", None),   # D-first: dangling delete, key never live
    ("d", 8, 40, "I", "x1"),
]
LATE = [
    ("b", 5, 23, "I", "w2"),   # re-slots between b's two deletes:
                               # lsn22 D becomes a closer, w2 not current
    ("a", 2, 15, "U", "v1b"),  # late update inside a's first interval
    ("c", 4, 31, "I", "c1"),   # before c's dangling D: D now closes it
]


def _full_oracle(spark):
    return scd2_snapshot(_feed(spark, ROWS + LATE), "k")


@pytest.mark.parametrize("fold", [False, True])
def test_incremental_converges_with_late_arrivals(spark, tmp_path, fold):
    """Append in 3 batches with the LATE rows delivered last; materialize
    (optionally folding the log away) between every append. Final
    history must equal the pure full-feed snapshot — including the
    dangling-delete reslotting cases."""
    t = Scd2Table.create(spark, str(tmp_path / "t"), key_col="k", num_buckets=4)
    batches = [ROWS[:4], ROWS[4:], LATE]
    for i, b in enumerate(batches):
        assert t.append_changes(_feed(spark, b), batch_id=i)
        t.materialize(fold=fold)
        # history readable at every step
        assert t.history().count() >= 0
    _assert_same(t.history(), _full_oracle(spark))

    # key 'b': w1 closed by D21, w2 (late) closed by the once-dangling D22
    bm = {r["valid_from_lsn"]: r["valid_to_lsn"]
          for r in t.history().where(F.col("k") == "b").collect()}
    assert bm == {20: 21, 23: 22}
    # key 'c': late insert closed by the previously-dangling D31? no —
    # c1 at day 4 lsn 31 precedes D at day 5 lsn 30: D closes it
    cm = {r["valid_from_lsn"]: r["valid_to_lsn"]
          for r in t.history().where(F.col("k") == "c").collect()}
    assert cm == {31: 30}


def test_incremental_no_materialize_and_mixed(spark, tmp_path):
    """Reads are correct with no cache at all and with a cache that
    covers only a prefix (MoR fix-up path)."""
    t = Scd2Table.create(spark, str(tmp_path / "t"), key_col="k")
    t.append_changes(_feed(spark, ROWS[:5]), 0)
    t.append_changes(_feed(spark, ROWS[5:]), 1)
    _assert_same(t.history(), scd2_snapshot(_feed(spark, ROWS), "k"))
    t.materialize(fold=False)          # cache covers 0,1; logs stay
    t.append_changes(_feed(spark, LATE), 2)
    _assert_same(t.history(), _full_oracle(spark))
    # untouched key 'd' served from cache: still exactly one open row
    d = t.history().where(F.col("k") == "d").collect()
    assert len(d) == 1 and d[0]["is_current"] == 1


def test_fence_and_fold_fence(spark, tmp_path):
    t = Scd2Table.create(spark, str(tmp_path / "t"), key_col="k")
    assert t.append_changes(_feed(spark, ROWS[:4]), 0)
    assert not t.append_changes(_feed(spark, ROWS[:4]), 0)  # fence
    t.materialize(fold=True)
    # re-delivery of a FOLDED batch id is also fenced
    assert not t.append_changes(_feed(spark, ROWS[:4]), 0)
    n0 = t.history().count()
    assert n0 == scd2_snapshot(_feed(spark, ROWS[:4]), "k").count()


def test_batch_order_invariance(spark, tmp_path):
    """Every delivery order of 3 batches converges to the same history."""
    want = _df_set(_full_oracle(spark))
    batches = [ROWS[:4], ROWS[4:], LATE]
    for j, perm in enumerate(itertools.permutations(range(3))):
        t = Scd2Table.create(spark, str(tmp_path / f"p{j}"), key_col="k")
        for bid in perm:
            t.append_changes(_feed(spark, batches[bid]), bid)
        assert _df_set(t.history()) == want, f"order {perm}"


def test_current_and_asof(spark, tmp_path):
    t = Scd2Table.create(spark, str(tmp_path / "t"), key_col="k")
    t.append_changes(_feed(spark, ROWS), 0)
    t.materialize(fold=True)
    t.append_changes(_feed(spark, LATE), 1)
    cur = {r["k"]: r["v"] for r in t.current().collect()}
    assert cur == {"a": "v4", "d": "x1"}  # b ends deleted, c ends deleted
    asof = {r["k"]: r["v"] for r in t.as_of(_t(5)).collect()}
    # day 5: a=v2 (lsn11 until day7), b=w2 (opened day5), c deleted at day5, d not yet
    assert asof == {"a": "v2", "b": "w2"}


def test_empty_table_raises(spark, tmp_path):
    t = Scd2Table.create(spark, str(tmp_path / "t"), key_col="k")
    with pytest.raises(ValueError):
        t.history()


def test_stream_dual_sink_history(spark, tmp_path):
    """run_stream(scd2_dir=...) maintains current + history from ONE
    stream: after replay (incl. kill/resume and a fresh-epoch duplicate
    delivery) the SCD2 current rows equal the lake live state — two
    independently-computed paths — and the full history equals the pure
    snapshot of the change feed."""
    import glob as _glob
    import os
    import shutil as _sh

    from datax_spark.cdc.generator import changes_df
    from datax_spark.cdc.pipeline import CHANGE_SCHEMA, run_stream
    from datax_spark.lake.table import LakeTable

    base = str(tmp_path)
    src = f"{base}/src"
    os.makedirs(src)
    ch = changes_df(spark, 4000, n_keys=600, partitions=4).cache()
    per = 4000 // 3 + 1
    for i in range(3):
        stg = f"{base}/stg{i}"
        ch.filter((F.col("lsn") >= i * per) & (F.col("lsn") < (i + 1) * per)) \
            .coalesce(1).write.parquet(stg)
        _sh.move(_glob.glob(f"{stg}/part-*.parquet")[0], f"{src}/f{i:03d}.parquet")

    schema = T.StructType(
        [f for f in CHANGE_SCHEMA.fields if f.name not in ("lsn", "op")])
    LakeTable.create(spark, f"{base}/table", schema, key_col="url", num_buckets=4)

    # kill after 2 batches, then resume; history materialize-folds every 2
    run_stream(spark, src, f"{base}/table", f"{base}/ckpt",
               max_files_per_trigger=1, available_now=False,
               stop_after_batches=2, timeout_sec=180,
               scd2_dir=f"{base}/hist", scd2_materialize_every=2)
    run_stream(spark, src, f"{base}/table", f"{base}/ckpt",
               available_now=True, timeout_sec=180,
               scd2_dir=f"{base}/hist", scd2_materialize_every=2)

    t = LakeTable(spark, f"{base}/table").load()
    hist = Scd2Table(spark, f"{base}/hist")

    live = t.read().select("url", "lang")
    cur = hist.current().select("url", "lang")
    assert live.exceptAll(cur).count() == 0 and cur.exceptAll(live).count() == 0
    assert cur.count() > 0

    # full history equals the pure snapshot of the whole feed
    want = scd2_snapshot(
        ch.select("url", "warc_ts", "lsn", "op", "html", "lang"),
        "url", ts_col="warc_ts",
    )
    got = hist.history()
    assert got.count() == want.count()
    assert (got.select("url", "valid_from_lsn", "valid_to_lsn", "is_current")
            .exceptAll(want.select("url", "valid_from_lsn", "valid_to_lsn", "is_current"))
            .count() == 0)

    # duplicate delivery under a FRESH checkpoint epoch: history converges
    # (scd2 (key,lsn) dedupe), current still equals live
    run_stream(spark, src, f"{base}/table", f"{base}/ckpt2",
               available_now=True, timeout_sec=180, scd2_dir=f"{base}/hist")
    assert hist.history().count() == want.count()
    cur2 = hist.current().select("url", "lang")
    live2 = t.read().select("url", "lang")
    assert live2.exceptAll(cur2).count() == 0 and cur2.exceptAll(live2).count() == 0


def test_retention_expires_closed_versions(spark, tmp_path):
    """materialize(retain_closed_after=H): closed intervals ending at or
    before H are expired (open rows never are, whatever their age),
    dangling deletes under H are GC'd, appends older than H are refused,
    and post-horizon processing stays convergent."""
    t = Scd2Table.create(spark, str(tmp_path / "t"), key_col="k")
    t.append_changes(_feed(spark, ROWS + LATE), 0)
    t.materialize(fold=True, retain_closed_after=_t(6))

    hist = t.history()
    # every surviving closed interval ends after day 6; opens survive
    closed = hist.where(F.col("valid_to_ts").isNotNull())
    assert closed.count() > 0
    assert closed.where(F.col("valid_to_ts") <= F.lit(_t(6))).count() == 0
    # a's current version (opened day 9) and d's (day 8, open) survive
    cur = {r["k"]: r["v"] for r in t.current().collect()}
    assert cur == {"a": "v4", "d": "x1"}
    # a's day3 version (closed day 7 > horizon) survives; day1/day2 gone
    a_lsns = sorted(r["valid_from_lsn"]
                    for r in hist.where(F.col("k") == "a").collect())
    assert a_lsns == [11, 14]

    # pre-horizon appends refused
    with pytest.raises(ValueError, match="retention"):
        t.append_changes(_feed(spark, [("z", 2, 99, "I", "zz")]), 1)

    # AT-horizon appends refused too: the expired range is
    # valid_to_ts <= H / deletes at ts <= H, so an accepted ts == H
    # change could interleave with an expired same-timestamp closer
    # (e.g. a late open with lsn below the expired delete's lsn would
    # wrongly become current). Refused range must coincide.
    with pytest.raises(ValueError, match="retention"):
        t.append_changes(_feed(spark, [("z", 6, 99, "I", "zz")]), 1)

    # post-horizon life continues: new change on a retained key converges
    t.append_changes(_feed(spark, [("a", 11, 50, "U", "v5")]), 2)
    t.materialize(fold=True)
    cur2 = {r["k"]: r["v"] for r in t.current().collect()}
    assert cur2 == {"a": "v5", "d": "x1"}
    a2 = {r["valid_from_lsn"]: r["valid_to_lsn"]
          for r in t.history().where(F.col("k") == "a").collect()}
    assert a2 == {11: 13, 14: 50, 50: None}


def test_schema_evolution_across_batches(spark, tmp_path):
    """A later batch carries a NEW attribute column: old versions (and
    cached untouched keys) surface it as NULL; convergence holds through
    materialize-fold; the evolved column round-trips the cache."""
    t = Scd2Table.create(spark, str(tmp_path / "t"), key_col="k")
    t.append_changes(_feed(spark, [("a", 1, 10, "I", "v1"),
                                   ("b", 2, 20, "I", "w1")]), 0)
    t.materialize(fold=True)
    evolved = spark.createDataFrame(
        [("a", _t(5), 30, "U", "v2", "extra-a")],
        "k string, ts timestamp, lsn long, op string, v string, note string")
    t.append_changes(evolved, 1)

    hist = {(r["k"], r["valid_from_lsn"]): (r["v"], r["note"])
            for r in t.history().collect()}
    assert hist == {
        ("a", 10): ("v1", None),
        ("a", 30): ("v2", "extra-a"),
        ("b", 20): ("w1", None),     # cached untouched key gets NULL note
    }
    # evolved column survives fold-materialize and further reads
    t.materialize(fold=True)
    hist2 = {(r["k"], r["valid_from_lsn"]): (r["v"], r["note"])
             for r in t.history().collect()}
    assert hist2 == hist
    cur = {r["k"]: r["note"] for r in t.current().collect()}
    assert cur == {"a": "extra-a", "b": None}


def test_scd2_lookup_join_version_in_force(spark):
    """Each fact matches exactly the version whose interval covers its
    ts; facts in a deletion hole / before the first version get no match
    (NULLs under left)."""
    from datax_spark.cdc.scd2 import scd2_lookup_join

    hist = scd2_snapshot(_feed(spark, [
        ("a", 1, 10, "I", "v1"),
        ("a", 3, 11, "U", "v2"),
        ("a", 7, 13, "D", None),
        ("a", 9, 14, "I", "v4"),
    ]), "k")
    facts = spark.createDataFrame(
        [(1, "a", _t(2)),   # inside v1
         (2, "a", _t(3)),   # boundary: v2 opens AT day3 (left-closed)
         (3, "a", _t(8)),   # deletion hole
         (4, "a", _t(12)),  # open current version
         (5, "zz", _t(5))], # unknown key
        "fid long, k string, fts timestamp")
    got = {r["fid"]: r["v"] for r in
           scd2_lookup_join(facts, hist, "k", "fts").collect()}
    assert got == {1: "v1", 2: "v2", 4: "v4"}
    left = scd2_lookup_join(facts, hist, "k", "fts", how="left")
    assert left.count() == 5
    assert left.where(F.col("fid").isin(3, 5)).where(F.col("v").isNull()).count() == 2
    # uniqueness: never more than one version per fact
    assert scd2_lookup_join(facts, hist, "k", "fts").count() == 3


def test_lookup_join_column_collision_raises(spark):
    from datax_spark.cdc.scd2 import scd2_lookup_join

    hist = scd2_snapshot(_feed(spark, [("a", 1, 10, "I", "v1")]), "k")
    facts = spark.createDataFrame([("a", _t(2), "x")],
                                  "k string, fts timestamp, v string")  # v clashes
    with pytest.raises(ValueError, match="collision"):
        scd2_lookup_join(facts, hist, "k", "fts")


def test_property_random_feeds_converge(spark, tmp_path):
    """Property: for RANDOM change feeds (random ops incl. D-first and
    D-runs, random ts collisions), random batch partitions, random
    delivery orders, and random fold points, the incremental Scd2Table
    equals the pure full-feed snapshot. Deterministic seeds — failures
    reproduce."""
    import random

    for seed in (11, 23, 47):
        rng = random.Random(seed)
        keys = ["k%d" % i for i in range(6)]
        rows = []
        for lsn in range(40):
            rows.append((
                rng.choice(keys),
                rng.randint(1, 25),             # day: deliberate ts ties
                100 + lsn,
                rng.choice(["I", "U", "U", "D"]),
                "v%d" % lsn,
            ))
        rows = [(k, d, l, op, None if op == "D" else v)
                for (k, d, l, op, v) in rows]

        n_batches = rng.randint(2, 5)
        batches = [[] for _ in range(n_batches)]
        for r in rows:
            batches[rng.randrange(n_batches)].append(r)
        order = list(range(n_batches))
        rng.shuffle(order)

        t = Scd2Table.create(spark, str(tmp_path / f"p{seed}"), key_col="k")
        for bid in order:
            if batches[bid]:
                t.append_changes(_feed(spark, batches[bid]), bid)
            if rng.random() < 0.5:
                t.materialize(fold=rng.random() < 0.5)
        want = scd2_snapshot(_feed(spark, rows), "k")
        assert _df_set(t.history()) == _df_set(want), f"seed {seed}"
