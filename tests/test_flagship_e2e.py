"""Flagship composition, end to end: the round-4 pieces working as ONE
pipeline rather than in isolation —

    sharded log tail (native DataSource, per-shard WAL cursors)
      → run_stream with canonicalize_key=True (crawl-dedup merge key)
        + merge_mode="mor" + size-triggered compaction
        + a job-completion hook
      → incremental feed sync into a downstream mirror table
      → both tables byte-equal to an independent SQL oracle computed
        over the RAW change set with python-side canonicalization.

Covers the seams between features that individually-green tests miss:
canonical keys flowing through MoR deltas + compaction, hooks observing
a shard_tail-fed run, and read_incremental over a canonically-keyed
table driving a mirror to the same state.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F, types as T

from datax_spark.cdc.pipeline import CHANGE_SCHEMA, run_stream
from datax_spark.lake.feed import sync_incremental
from datax_spark.lake.table import LakeTable


def _write_shard(root: str, shard: int, fidx: int, rows: list[tuple]):
    d = os.path.join(root, f"shard={shard}")
    os.makedirs(d, exist_ok=True)
    t = pa.table({
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "op": pa.array([r[1] for r in rows]),
        "url": pa.array([r[2] for r in rows]),
        "warc_ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "html": pa.array([None] * len(rows), pa.binary()),
        "lang": pa.array([r[4] for r in rows]),
    })
    pq.write_table(t, os.path.join(d, f"f{fidx:04d}.parquet"))


def _changes():
    """Deterministic messy-URL change stream spread over 2 shards × 2
    files: spellings of page p are 'http://S.ex/p' variants."""
    import datetime

    rows = []
    for i in range(120):
        p = i % 15  # 15 logical pages
        scheme = "HTTP" if i % 4 == 0 else "http"
        host = f"s{p % 3}.example.com" if i % 2 else f"S{p % 3}.EXAMPLE.COM"
        url = f"{scheme}://{host}/page/{p}" + ("/" if i % 3 == 0 else "")
        if i % 5 == 0:
            url += "#frag"
        op = "D" if i % 29 == 0 else ("I" if i % 7 == 0 else "U")
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=(i * 13) % 200)
        rows.append((i, op, url, ts, f"v{i}"))
    return rows


def _canon(u: str) -> str:
    # independent python canonicalizer (scheme/host lower, strip
    # trailing slash + fragment; fixture has no query params)
    u = u.split("#", 1)[0]
    scheme, _, rest = u.partition("://")
    host, slash, path = rest.partition("/")
    path = (slash + path).rstrip("/")
    return f"{scheme.lower()}://{host.lower()}{path}"


def test_flagship_composition(spark, tmp_path):
    base = str(tmp_path)
    tail_root = f"{base}/tail"
    table_root = f"{base}/table"
    mirror_root = f"{base}/mirror"
    rows = _changes()
    # shard by lsn parity, two files per shard (late file arrives below)
    for shard in (0, 1):
        mine = [r for r in rows if r[0] % 2 == shard and r[0] < 80]
        _write_shard(tail_root, shard, 0, mine)

    schema = T.StructType([f for f in CHANGE_SCHEMA.fields if f.name not in ("lsn", "op")])
    LakeTable.create(spark, table_root, schema, key_col="url", num_buckets=4)
    LakeTable.create(spark, mirror_root, schema, key_col="url", num_buckets=2)

    hook_calls = []

    def audit(cfg, summary):
        hook_calls.append((cfg["source_format"], summary["batches_applied"]))

    # phase 1: first 80 changes through the shard tail
    run_stream(spark, tail_root, table_root, f"{base}/ckpt",
               source_format="shard_tail", available_now=True, timeout_sec=180,
               merge_mode="mor", compact_delta_ratio=0.5,
               canonicalize_key=True, hooks=[audit])
    # phase 2: late files append to both shards; resume same checkpoint
    for shard in (0, 1):
        mine = [r for r in rows if r[0] % 2 == shard and r[0] >= 80]
        _write_shard(tail_root, shard, 1, mine)
    run_stream(spark, tail_root, table_root, f"{base}/ckpt",
               source_format="shard_tail", available_now=True, timeout_sec=180,
               merge_mode="mor", compact_delta_ratio=0.5,
               canonicalize_key=True, hooks=[audit])

    assert [c[0] for c in hook_calls] == ["shard_tail", "shard_tail"]
    assert sum(c[1] for c in hook_calls) >= 2

    # oracle: python LWW over canonical keys of the raw change set
    best = {}
    for lsn, op, url, ts, lang in rows:
        c = _canon(url)
        cur = best.get(c)
        if cur is None or (ts, lsn) > (cur[0], cur[1]):
            best[c] = (ts, lsn, op, lang)
    expect = {c: v[3] for c, v in best.items() if v[2] != "D"}

    t = LakeTable(spark, table_root).load()
    got = {r["url"]: r["lang"] for r in t.read().collect()}
    assert got == expect

    # phase 3: incremental sync into the mirror, then one more tick
    m = LakeTable(spark, mirror_root).load()
    r1 = sync_incremental(t, m)
    assert not r1.get("skipped")
    got_m = {r["url"]: r["lang"] for r in LakeTable(spark, mirror_root).load().read().collect()}
    assert got_m == expect
    # fenced no-op on repeat
    r2 = sync_incremental(LakeTable(spark, table_root).load(),
                          LakeTable(spark, mirror_root).load())
    assert r2.get("skipped")
