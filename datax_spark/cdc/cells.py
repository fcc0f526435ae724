"""Column-granular (per-cell) multi-version change merge.

The reference's multi-version mode emits ONE change per column with
per-cell semantics (``otsstreamreader/.../core/MultiVerModeRecordSender
.java:21-128``): opTypes U (update a cell version), DO (delete one
version), DA (delete all versions of a column), DR (delete the row).
Round 2 decoded that shape (cdc_multiver_fanout) but applied changes
whole-row; this module merges per cell, so a partial-column update
stream never clobbers untouched columns.

Cell change row: ``(pk, col_name, ts, lsn, op, value)`` where ``ts`` is
the cell VERSION timestamp and ``lsn`` the log order. Semantics (a
deterministic function of the full change set — hence replay-convergent
under any batching):

- ``U``   writes version ``(pk, col, ts) = value``. Among U/DO ops on
  the SAME version, the highest ``lsn`` wins (log causality): a DO after
  a U deletes it; a later U re-write of the same version resurrects it.
- ``DO``  deletes the single version ``(pk, col, ts)`` (see above).
- ``DA``  deletes every version of ``(pk, col)`` with
  ``(ts, lsn) <= (da.ts, da.lsn)`` — a column-range tombstone; newer
  writes survive.
- ``DR``  deletes every cell of ``pk`` with ``(ts, lsn) <= (dr.ts,
  dr.lsn)`` — a row-range tombstone.

A row's final value per column = newest surviving version; a row with no
surviving cells is absent.

Two execution shapes, same algebra:

- :func:`collapse_cell_changes` — single-shot batch collapse of a cell
  change set to final rows (pure DataFrame ops: two narrow hash
  aggregates + two marker joins; shuffles carry (pk, col, ts, lsn,
  value) only).
- a **cell-store LakeTable**: :func:`cells_to_changes` maps cell ops
  onto the engine's existing row algebra (each VERSION is a table row
  keyed by ``pk␟col␟V␟version``; DO = that key's tombstone; DA/DR are
  watermark marker rows whose LWW max is the range tombstone), so the
  fenced/exactly-once/CoW/MoR machinery applies unchanged across
  batches; :func:`read_cell_rows` assembles final rows at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CELL_OPS = ("U", "DO", "DA", "DR")
SEP = "\x1f"


def _w(ts_col: str, lsn_col: str):
    """Order-comparable (ts, lsn) struct with pinned field names."""
    return F.struct(F.col(ts_col).alias("o_ts"), F.col(lsn_col).alias("o_lsn"))


def _assemble(
    alive: DataFrame,
    da: DataFrame,
    dr: DataFrame,
    col_names: list[str],
    pk_col: str,
    col_col: str,
) -> DataFrame:
    """Final rows from surviving versions + range-tombstone watermarks.

    ``alive``: (pk, col, o struct(o_ts,o_lsn), value) — one row per
    surviving version; ``da``: (pk, col, daw struct); ``dr``: (pk, drw
    struct). The marker joins are key-equi joins on narrow relations
    (markers ∝ delete ops, typically ≪ versions; AQE broadcasts them
    when small).
    """
    win = alive.groupBy(pk_col, col_col).agg(
        F.max(F.struct(F.col("o").alias("o"), F.col("value").alias("value"))).alias("uw")
    )
    out = (
        win.join(da, [pk_col, col_col], "left")
        .join(dr, [pk_col], "left")
        .filter(
            (F.col("daw").isNull() | (F.col("uw.o") > F.col("daw")))
            & (F.col("drw").isNull() | (F.col("uw.o") > F.col("drw")))
        )
    )
    return out.groupBy(pk_col).agg(
        *[
            F.max(F.when(F.col(col_col) == c, F.col("uw.value"))).alias(c)
            for c in col_names
        ]
    )


def collapse_cell_changes(
    cells: DataFrame,
    col_names: list[str],
    pk_col: str = "pk",
    col_col: str = "col_name",
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    val_col: str = "value",
) -> DataFrame:
    """Single-shot collapse of a cell change set → final rows
    ``(pk, *col_names)`` (values as written; absent cells NULL; fully
    dead rows absent)."""
    c = cells.select(
        F.col(pk_col).alias(pk_col),
        F.col(col_col).alias(col_col),
        F.col(ts_col).cast("timestamp").alias(ts_col),
        F.col(lsn_col).cast("bigint").alias(lsn_col),
        F.col(op_col).alias(op_col),
        F.col(val_col).cast("string").alias("value"),
    )
    # version winner: max-lsn op among U/DO on the same (pk, col, ts)
    vs = c.filter(F.col(op_col).isin("U", "DO"))
    per_ver = vs.groupBy(pk_col, col_col, ts_col).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("op"), F.col("value").alias("value")),
            F.col(lsn_col),
        ).alias("vw"),
        F.max(lsn_col).alias("vlsn"),
    )
    alive = per_ver.filter(F.col("vw.op") == "U").select(
        pk_col,
        col_col,
        _w(ts_col, "vlsn").alias("o"),
        F.col("vw.value").alias("value"),
    )
    da = (
        c.filter(F.col(op_col) == "DA")
        .groupBy(pk_col, col_col)
        .agg(F.max(_w(ts_col, lsn_col)).alias("daw"))
    )
    dr = (
        c.filter(F.col(op_col) == "DR")
        .groupBy(pk_col)
        .agg(F.max(_w(ts_col, lsn_col)).alias("drw"))
    )
    return _assemble(alive, da, dr, col_names, pk_col, col_col)


# ------------------------------------------------- cell-store LakeTable

def cell_table_schema(pk_type: str = "string"):
    """User schema for a cell-store LakeTable (key = cell_key)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("cell_key", T.StringType(), False),
            T.StructField("pk", getattr(T, "StringType")() if pk_type == "string" else T.LongType()),
            T.StructField("col_name", T.StringType()),
            T.StructField("kind", T.StringType()),  # V | DA | DR
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.StringType()),
        ]
    )


def cells_to_changes(
    cells: DataFrame,
    pk_col: str = "pk",
    col_col: str = "col_name",
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    val_col: str = "value",
) -> DataFrame:
    """Map cell ops onto the engine's row change algebra for a cell-store
    LakeTable (merge with ``merge_into(..., ts_col='ts', lsn_col='lsn')``):

    - U  → upsert of the version row (key ``pk␟col␟V␟micros(ts)``)
    - DO → tombstone of that version row (same key, op D) — the existing
      LWW (ts fixed → lsn decides) gives exactly the version-delete /
      re-write-resurrects causality
    - DA → upsert of a ``pk␟col␟DA`` marker row; LWW keeps the MAX
      (ts, lsn) watermark
    - DR → upsert of a ``pk␟DR`` marker row (ditto)
    """
    kind = (
        F.when(F.col(op_col).isin("U", "DO"), F.lit("V"))
        .when(F.col(op_col) == "DA", F.lit("DA"))
        .otherwise(F.lit("DR"))
    )
    key = (
        F.when(
            F.col(op_col).isin("U", "DO"),
            F.concat_ws(SEP, F.col(pk_col).cast("string"), F.col(col_col), F.lit("V"),
                        F.unix_micros(F.col(ts_col).cast("timestamp")).cast("string")),
        )
        .when(
            F.col(op_col) == "DA",
            F.concat_ws(SEP, F.col(pk_col).cast("string"), F.col(col_col), F.lit("DA")),
        )
        .otherwise(F.concat_ws(SEP, F.col(pk_col).cast("string"), F.lit(""), F.lit("DR")))
    )
    row_op = F.when(F.col(op_col) == "DO", F.lit("D")).otherwise(F.lit("U"))
    return cells.select(
        key.alias("cell_key"),
        row_op.alias("op"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(lsn_col).cast("bigint").alias("lsn"),
        F.col(pk_col).cast("string").alias("pk"),
        F.when(F.col(op_col) != "DR", F.col(col_col)).alias("col_name"),
        kind.alias("kind"),
        F.when(F.col(op_col) == "U", F.col(val_col).cast("string")).alias("value"),
    )


def read_cell_rows(table, col_names: list[str]) -> DataFrame:
    """Assemble final rows (pk, *col_names) from a cell-store LakeTable.

    DO-deleted versions are already tombstoned rows (filtered by
    ``table.read()``); DA/DR marker rows carry their watermark in
    (ts, _lsn). Same `_assemble` algebra as the batch collapse.
    """
    t = table.read(include_deleted=False, include_system=True)
    alive = t.filter(F.col("kind") == "V").select(
        "pk", "col_name", _w("ts", "_lsn").alias("o"), "value"
    )
    da = (
        t.filter(F.col("kind") == "DA")
        .groupBy("pk", "col_name")
        .agg(F.max(_w("ts", "_lsn")).alias("daw"))
    )
    dr = (
        t.filter(F.col("kind") == "DR")
        .groupBy("pk")
        .agg(F.max(_w("ts", "_lsn")).alias("drw"))
    )
    return _assemble(alive, da, dr, col_names, "pk", "col_name")
