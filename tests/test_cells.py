"""Column-granular (per-cell) multi-version merge semantics + convergence.

Reference semantics: otsstreamreader MultiVerModeRecordSender.java:21-128
(opTypes U / DO / DA / DR, one change per column, per-cell version
timestamps). Properties pinned here:

- collapse_cell_changes matches an independent pure-python reference on
  hand-built adversarial causality cases AND seeded collision-heavy
  random streams;
- the cell-store LakeTable path (cells_to_changes -> merge_into ->
  read_cell_rows) replay-converges: any batching of the same cell stream
  yields byte-identical final rows, equal to the single-shot collapse,
  in BOTH CoW and MoR modes;
- partial-column updates never clobber untouched columns (the round-2
  whole-row-LWW gap this module closes).
"""

import os
import random

import pytest
from pyspark.sql import functions as F

from datax_spark.cdc.cells import (
    cell_table_schema,
    cells_to_changes,
    collapse_cell_changes,
    read_cell_rows,
)
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

COLS = ["c0", "c1", "c2"]


def pyref_cells(cells, cols):
    """Independent reference: dict pk -> tuple(values per col)."""
    per_ver, da, dr = {}, {}, {}
    for pk, col, ts, lsn, op, val in cells:
        if op in ("U", "DO"):
            k = (pk, col, ts)
            if k not in per_ver or lsn > per_ver[k][0]:
                per_ver[k] = (lsn, op, val)
        elif op == "DA":
            k = (pk, col)
            da[k] = max(da.get(k, (ts, lsn)), (ts, lsn))
        elif op == "DR":
            dr[pk] = max(dr.get(pk, (ts, lsn)), (ts, lsn))
        else:  # pragma: no cover
            raise ValueError(op)
    best = {}
    for (pk, col, ts), (lsn, op, val) in per_ver.items():
        if op != "U":
            continue
        w = (ts, lsn)
        if (pk, col) in da and w <= da[(pk, col)]:
            continue
        if pk in dr and w <= dr[pk]:
            continue
        if (pk, col) not in best or w > best[(pk, col)][0]:
            best[(pk, col)] = (w, val)
    rows = {}
    for (pk, col), (_, val) in best.items():
        rows.setdefault(pk, {})[col] = val
    return {pk: tuple(d.get(c) for c in cols) for pk, d in rows.items()}


def _df(spark, cells):
    df = spark.createDataFrame(
        cells, "pk string, col_name string, ts long, lsn long, op string, value string"
    )
    return df.withColumn("ts", F.timestamp_seconds(F.col("ts")))


def _collapse_dict(spark, cells):
    out = collapse_cell_changes(_df(spark, cells), COLS)
    return {r["pk"]: tuple(r[c] for c in COLS) for r in out.collect()}


# Adversarial causality fixture — every reference opType interaction:
#  k1: U then DO on the SAME version (lsn later) -> version deleted;
#      an older surviving version shows through.
#  k2: DO then U on the SAME version (lsn later) -> resurrected.
#  k3: DA between two versions -> older dies, newer survives; other
#      column untouched (partial-column isolation).
#  k4: DR wipes everything at or below its watermark; a write with a
#      NEWER ts survives the row tombstone.
#  k5: fully dead row (DR above all writes) -> absent from output.
#  k6: U touching only c1 -> c0/c2 NULL, never clobbered.
ADVERSARIAL = [
    ("k1", "c0", 100, 1, "U", "v-new"),
    ("k1", "c0", 100, 2, "DO", None),      # deletes version ts=100
    ("k1", "c0", 50, 3, "U", "v-old"),     # older version survives -> wins
    ("k2", "c0", 100, 1, "DO", None),
    ("k2", "c0", 100, 2, "U", "v-resurrected"),  # later lsn re-writes version
    ("k3", "c0", 10, 1, "U", "a"),
    ("k3", "c0", 30, 2, "U", "b"),
    ("k3", "c0", 20, 3, "DA", None),       # kills ts<=20: 'a' dies, 'b' lives
    ("k3", "c1", 5, 4, "U", "untouched"),
    ("k4", "c0", 10, 1, "U", "gone"),
    ("k4", "c1", 15, 2, "U", "gone-too"),
    ("k4", "c2", 40, 3, "U", "after-dr"),  # newer than the DR watermark
    ("k4", "c0", 30, 4, "DR", None),
    ("k5", "c0", 10, 1, "U", "x"),
    ("k5", "c1", 20, 2, "U", "y"),
    ("k5", "c2", 30, 3, "U", "z"),
    ("k5", "c0", 99, 4, "DR", None),
    ("k6", "c1", 7, 1, "U", "only-c1"),
]


def test_collapse_adversarial_matches_pyref(spark):
    got = _collapse_dict(spark, ADVERSARIAL)
    exp = pyref_cells(ADVERSARIAL, COLS)
    assert got == exp
    # spot-check the semantics themselves, not just pyref agreement
    assert got["k1"] == ("v-old", None, None)
    assert got["k2"] == ("v-resurrected", None, None)
    assert got["k3"] == ("b", "untouched", None)
    assert got["k4"] == (None, None, "after-dr")
    assert "k5" not in got
    assert got["k6"] == (None, "only-c1", None)


def _random_cells(seed, n=400, n_keys=12, n_ts=6):
    """Collision-heavy: tiny (pk, col, ts) domain forces same-version
    U/DO causality races; ~15% range tombstones."""
    rng = random.Random(seed)
    cells = []
    for lsn in range(1, n + 1):
        pk = f"k{rng.randrange(n_keys)}"
        col = COLS[rng.randrange(len(COLS))]
        ts = (rng.randrange(n_ts) + 1) * 10
        r = rng.random()
        if r < 0.70:
            cells.append((pk, col, ts, lsn, "U", f"v{lsn}"))
        elif r < 0.85:
            cells.append((pk, col, ts, lsn, "DO", None))
        elif r < 0.93:
            cells.append((pk, col, ts, lsn, "DA", None))
        else:
            cells.append((pk, "", ts, lsn, "DR", None))
    return cells


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_collapse_random_matches_pyref(spark, seed):
    cells = _random_cells(seed)
    assert _collapse_dict(spark, cells) == pyref_cells(
        [(p, c, t, l, o, v) for p, c, t, l, o, v in cells], COLS
    )


def _store_replay(spark, root, cells, batching, mode):
    t = LakeTable.create(
        spark, root, cell_table_schema(), key_col="cell_key", num_buckets=4
    )
    df = cells_to_changes(_df(spark, cells)).cache()
    total = sum(batching)
    lo = 0
    for i, w in enumerate(batching):
        hi = lo + w
        batch = df.filter((F.col("lsn") % total >= lo) & (F.col("lsn") % total < hi))
        merge_into(t, batch, ts_col="ts", lsn_col="lsn", batch_id=i, merge_mode=mode)
        lo = hi
    out = read_cell_rows(t, COLS)
    return {r["pk"]: tuple(r[c] for c in COLS) for r in out.collect()}


@pytest.mark.parametrize("mode", ["cow", "mor"])
@pytest.mark.parametrize("batching", [[1], [3, 2], [1, 4, 2, 5]])
def test_cell_store_replay_convergence(spark, tmp_path, mode, batching):
    cells = ADVERSARIAL + _random_cells(99, n=200)
    exp = pyref_cells(cells, COLS)
    root = str(tmp_path / f"cells_{mode}_{len(batching)}")
    got = _store_replay(spark, root, cells, batching, mode)
    assert got == exp


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_cell_store_duplicate_delivery_noop(spark, tmp_path, mode):
    """Re-merging the full cell stream is absorbed (idempotent replay)."""
    cells = ADVERSARIAL
    t = LakeTable.create(
        spark, str(tmp_path / f"dup_{mode}"), cell_table_schema(),
        key_col="cell_key", num_buckets=4,
    )
    df = cells_to_changes(_df(spark, cells)).cache()
    merge_into(t, df, ts_col="ts", lsn_col="lsn", merge_mode=mode)
    merge_into(t, df, ts_col="ts", lsn_col="lsn", merge_mode=mode)
    got = {r["pk"]: tuple(r[c] for c in COLS)
           for r in read_cell_rows(t, COLS).collect()}
    assert got == pyref_cells(cells, COLS)


def test_partial_column_update_preserves_other_columns(spark, tmp_path):
    """The round-2 gap: a later partial update must not clobber columns
    it does not touch (whole-row LWW would)."""
    t = LakeTable.create(
        spark, str(tmp_path / "partial"), cell_table_schema(),
        key_col="cell_key", num_buckets=2,
    )
    b1 = [("k", "c0", 10, 1, "U", "keep-me"), ("k", "c1", 10, 2, "U", "old")]
    b2 = [("k", "c1", 20, 3, "U", "new")]  # touches ONLY c1, later ts
    merge_into(t, cells_to_changes(_df(spark, b1)), ts_col="ts", lsn_col="lsn", batch_id=0)
    merge_into(t, cells_to_changes(_df(spark, b2)), ts_col="ts", lsn_col="lsn", batch_id=1)
    got = {r["pk"]: (r["c0"], r["c1"]) for r in read_cell_rows(t, ["c0", "c1"]).collect()}
    assert got == {"k": ("keep-me", "new")}


def test_cell_stream_end_to_end(spark, tmp_path):
    """Column-granular CDC through the REAL streaming path: parquet cell
    files tailed by run_stream (pre_merge=cells_to_changes decode per
    micro-batch) into a cell-store LakeTable; final assembled rows match
    the pure-python reference."""
    import glob
    import shutil

    from datax_spark.cdc.pipeline import run_stream

    base = str(tmp_path)
    src, root, ckpt = f"{base}/src", f"{base}/table", f"{base}/ckpt"
    cells = ADVERSARIAL + _random_cells(31, n=150)
    df = _df(spark, cells).cache()
    os.makedirs(src)
    n_files, total = 3, len(cells)
    per = total // n_files + 1
    order = F.col("lsn")
    for i in range(n_files):
        stg = f"{base}/stg{i}"
        df.filter((order > i * per) & (order <= (i + 1) * per)) \
            .coalesce(1).write.parquet(stg)
        shutil.move(glob.glob(f"{stg}/part-*.parquet")[0], f"{src}/f{i:03d}.parquet")

    LakeTable.create(spark, root, cell_table_schema(), key_col="cell_key", num_buckets=4)
    from datax_spark.cdc.cells import cells_to_changes as decode

    run_stream(
        spark, src, root, ckpt,
        schema=df.schema,
        max_files_per_trigger=1,
        available_now=True,
        timeout_sec=180,
        ts_col="ts",
        lsn_col="lsn",
        pre_merge=decode,
        merge_mode="mor",
    )
    t = LakeTable(spark, root).load()
    got = {r["pk"]: tuple(r[c] for c in COLS)
           for r in read_cell_rows(t, COLS).collect()}
    assert got == pyref_cells(cells, COLS)
