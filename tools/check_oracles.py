"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark and, where an oracle
exists, the same query in DuckDB; compares row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted by
their full stringified tuple). Reports per-query PASS/FAIL.

The cell stringification is deliberately STRICT — plain ``str(v)``, no
float normalization — because the driver's gate is (observed r3,
VERDICT.md "What's wrong #1"): a DuckDB HUGEINT sum materialized as
pandas float64 hashes as "28.0" against Spark's bigint "28" and FAILS,
so oracles must CAST widening aggregates back to the Spark-side type.
Anything green under this protocol is green under any reasonable
stringify.

Per-query wall-clock (Spark side) is appended to ORACLE_TIMES.json at
the repo root so driver-gate truncation/timeout is diagnosable from
inside the repo (VERDICT.md next-round item #9).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from datax_spark.session import get_spark  # noqa: E402

# override with SPARK_GRAFT_ORACLE_SF_DIR to run the identical protocol
# at another scale (e.g. the tools/gen_sf.py sf1 fixtures); per-query
# walls are persisted only for the default gate-budget sf0.01 run
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
_IS_DEFAULT_SF = SF_DIR == "/root/testdata/sf0.01"
TIMES_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ORACLE_TIMES.json")


def norm_cell(v):
    if v is None or v != v:  # None / NaN
        return ""
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def frame_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    d = df[cols]
    rows = sorted("\x01".join(norm_cell(v) for v in row) for row in d.itertuples(index=False, name=None))
    h = hashlib.md5("\x02".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main(selected: list[str] | None = None):
    if selected:
        # skip computing unselected python-backed VALUES oracles —
        # at sf1 they are hours of eager pure-python work otherwise
        os.environ["SPARK_GRAFT_ORACLE_ONLY"] = ",".join(selected)
    spark = get_spark(master="local[16]")
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    times: dict[str, float] = {}
    row_counts: dict[str, int] = {}
    for name, fn in qs.items():
        if selected and name not in selected:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            results[name] = ("SPARK-ERROR", traceback.format_exc(limit=3))
            times[name] = round(time.time() - t0, 2)
            print(f"{name:28s} SPARK-ERROR")
            continue
        times[name] = round(time.time() - t0, 2)
        row_counts[name] = len(sdf)
        if name not in oracles:
            results[name] = ("ROWS-ONLY", len(sdf))
            print(f"{name:28s} ROWS-ONLY rows={len(sdf)}  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            results[name] = ("ORACLE-ERROR", traceback.format_exc(limit=3))
            print(f"{name:28s} ORACLE-ERROR")
            continue
        sn, sc, sh = frame_hash(sdf)
        on, oc, oh = frame_hash(odf)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        status = "PASS" if ok else "FAIL"
        results[name] = (status, dict(spark=(sn, sc, sh), duck=(on, oc, oh)))
        print(f"{name:28s} {status} rows {sn}/{on} cols {'=' if sc == oc else (sc, oc)} hash {'=' if sh == oh else 'DIFF'}  ({time.time()-t0:.1f}s)")
        if not ok and sn == on and sc == oc:
            # show a sample diff
            scols = sorted(sdf.columns)
            a = sdf[scols].astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().reset_index(drop=True)
            b = odf[scols].astype(str).apply(lambda r: "|".join(r), axis=1).sort_values().reset_index(drop=True)
            neq = (a != b)
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"    spark: {a[i][:200]}")
                print(f"    duck : {b[i][:200]}")
    if not selected and _IS_DEFAULT_SF:  # full pass: persist per-query walls for gate-budget diagnosis
        with open(TIMES_PATH, "w") as fh:
            json.dump(
                {"sf_dir": SF_DIR, "spark_wall_sec": times,
                 "rows": row_counts,
                 "total_sec": round(sum(times.values()), 2)},
                fh, indent=1, sort_keys=False)
        print(f"[oracle-times] wrote {TIMES_PATH} total={sum(times.values()):.1f}s")
        empty = sorted(n for n, c in row_counts.items() if c == 0)
        if empty:
            print(f"[oracle-times] EMPTY-RESULT rows (prove nothing): {empty}")
    fails = [k for k, v in results.items() if v[0] not in ("PASS", "ROWS-ONLY")]
    print(f"\n{len(results)} checked, {len(fails)} failing: {fails}")
    for k in fails:
        if results[k][0].endswith("ERROR"):
            print("----", k, "----")
            print(results[k][1])
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
