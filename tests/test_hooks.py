"""Job-completion Hook SPI (datax_spark/hooks.py — the
JobContainer.invokeHooks / Hook.java analog) on both entry points, plus
the canonicalize_key merge opt-in on the streaming pipeline."""

import glob
import json
import os
import shutil

from pyspark.sql import Row, functions as F, types as T

from datax_spark.config import JobConfig, run_job
from datax_spark.cdc.pipeline import CHANGE_SCHEMA, run_stream
from datax_spark.hooks import invoke_hooks
from datax_spark.lake.table import LakeTable


def test_invoke_hooks_isolation_and_order():
    calls = []

    def good(cfg, metrics):
        calls.append(("good", metrics["x"]))

    def bad(cfg, metrics):
        raise RuntimeError("boom")

    class CallableHook:
        def __call__(self, cfg, metrics):
            calls.append(("obj", cfg["k"]))

    out = invoke_hooks([good, bad, CallableHook()], {"k": 1}, {"x": 2})
    assert calls == [("good", 2), ("obj", 1)]
    assert [r["ok"] for r in out] == [True, False, True]
    assert out[1] == {"hook": "bad", "ok": False, "error": "RuntimeError: boom"}
    assert invoke_hooks(None, {}, {}) == []


def test_run_job_invokes_hooks_with_config_and_metrics(spark):
    seen = []

    def record(job_doc, result):
        seen.append((job_doc["reader"]["name"], result["rows"]))

    def explode(job_doc, result):
        raise ValueError("reporting backend down")

    cfg = JobConfig.from_json(json.dumps({
        "job": {
            "setting": {"speed": {"channel": 2}},
            "content": [{
                "reader": {"name": "streamreader", "parameter": {
                    "sliceRecordCount": 3,
                    "column": [{"type": "string", "value": "X", "name": "c0"}]}},
                "writer": {"name": "streamwriter", "parameter": {}},
            }],
        }
    }))
    out = run_job(spark, cfg, hooks=[record, explode])
    # the job result is unaffected by the failing hook (log-and-continue)
    assert out["rows"] == 6
    assert seen == [("streamreader", 6)]
    assert out["hooks"][0] == {"hook": "record", "ok": True}
    assert out["hooks"][1]["ok"] is False and "ValueError" in out["hooks"][1]["error"]


def _seed_changes(spark, src, rows):
    df = spark.createDataFrame(rows, CHANGE_SCHEMA)
    stg = src + ".stg"
    df.coalesce(1).write.parquet(stg)
    os.makedirs(src, exist_ok=True)
    shutil.move(glob.glob(f"{stg}/part-*.parquet")[0], f"{src}/f000.parquet")


def _mk_rows(spec):
    """spec: (lsn, op, url, ts_str, lang)"""
    import datetime

    return [
        Row(lsn=lsn, op=op, url=url,
            warc_ts=datetime.datetime.fromisoformat(ts), html=None, lang=lang)
        for lsn, op, url, ts, lang in spec
    ]


def test_run_stream_hooks_fire_after_bounded_replay(spark, tmp_path):
    base = str(tmp_path)
    src, root, ckpt = f"{base}/src", f"{base}/table", f"{base}/ckpt"
    _seed_changes(spark, src, _mk_rows([
        (1, "I", "http://a.example/x", "2024-01-01 00:00:00", "en"),
        (2, "U", "http://b.example/y", "2024-01-01 00:01:00", "de"),
    ]))
    schema = T.StructType([f for f in CHANGE_SCHEMA.fields if f.name not in ("lsn", "op")])
    LakeTable.create(spark, root, schema, key_col="url", num_buckets=2)

    seen = []

    def record(job_doc, summary):
        seen.append((job_doc["table_root"], summary["batches_applied"],
                     summary["last_batch"]["batch_id"]))

    q = run_stream(spark, src, root, ckpt, available_now=True,
                   timeout_sec=120, hooks=[record])
    assert seen and seen[0][0] == root and seen[0][1] >= 1
    assert q.datax_hook_results == [{"hook": "record", "ok": True}]


def test_canonicalize_key_collapses_url_spellings(spark, tmp_path):
    """Two raw spellings of one page race through the merge: with
    canonicalize_key=True they land on ONE lake row whose value is the
    global (ts, lsn) LWW winner across both spellings; a later
    differently-spelled tombstone deletes the page."""
    base = str(tmp_path)
    src, root, ckpt = f"{base}/src", f"{base}/table", f"{base}/ckpt"
    _seed_changes(spark, src, _mk_rows([
        # page 1: three spellings, winner is lsn 3 (latest ts)
        (1, "I", "http://Site.Example/a/b/", "2024-01-01 00:00:00", "v1"),
        (2, "U", "HTTP://site.example/a/b?",  "2024-01-01 00:01:00", "v2"),
        (3, "U", "http://site.example/a/b#frag", "2024-01-01 00:02:00", "v3"),
        # page 2: insert then tombstone under a different spelling
        (4, "I", "http://other.example/p?x=1&y=2", "2024-01-01 00:00:00", "w1"),
        (5, "D", "http://OTHER.example/p?y=2&x=1", "2024-01-01 00:03:00", None),
        # page 3: query-param ORDER differs, values differ — later wins
        (6, "I", "http://q.example/?b=2&a=1", "2024-01-01 00:00:00", "q1"),
        (7, "U", "http://q.example/?a=1&b=2", "2024-01-01 00:00:30", "q2"),
    ]))
    schema = T.StructType([f for f in CHANGE_SCHEMA.fields if f.name not in ("lsn", "op")])
    LakeTable.create(spark, root, schema, key_col="url", num_buckets=2)
    run_stream(spark, src, root, ckpt, available_now=True, timeout_sec=120,
               canonicalize_key=True)

    rows = {r["url"]: r["lang"] for r in LakeTable(spark, root).load().read().collect()}
    assert rows == {
        "http://site.example/a/b": "v3",
        "http://q.example?a=1&b=2": "q2",
        # other.example page was tombstoned by the alternate spelling
    }


def test_canonicalize_key_composes_with_user_pre_merge(spark, tmp_path):
    """A caller's pre_merge runs FIRST, then the canonical rewrite."""
    base = str(tmp_path)
    src, root, ckpt = f"{base}/src", f"{base}/table", f"{base}/ckpt"
    _seed_changes(spark, src, _mk_rows([
        (1, "I", "http://A.example/x", "2024-01-01 00:00:00", "en"),
        (2, "U", "http://a.example/x/", "2024-01-01 00:01:00", "de"),
    ]))
    schema = T.StructType([f for f in CHANGE_SCHEMA.fields if f.name not in ("lsn", "op")])
    LakeTable.create(spark, root, schema, key_col="url", num_buckets=2)

    def upper_lang(df):
        return df.withColumn("lang", F.upper("lang"))

    run_stream(spark, src, root, ckpt, available_now=True, timeout_sec=120,
               canonicalize_key=True, pre_merge=upper_lang)
    rows = LakeTable(spark, root).load().read().collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "http://a.example/x"
    assert rows[0]["lang"] == "DE"


def test_pre_hooks_run_before_job_body_both_entry_points(spark, tmp_path):
    """preHandler SPI (JobContainer.java:109-110,312-341 analog): pre
    hooks see the job config BEFORE any work, a failing pre hook never
    blocks the job, and outcomes are recorded on both entry points."""
    order = []

    def pre_rec(job_doc):
        order.append(("pre", job_doc["reader"]["name"]))

    def pre_boom(job_doc):
        raise RuntimeError("setup backend down")

    def post_rec(job_doc, result):
        order.append(("post", result["rows"]))

    cfg = JobConfig.from_json(json.dumps({
        "job": {
            "setting": {"speed": {"channel": 2}},
            "content": [{
                "reader": {"name": "streamreader", "parameter": {
                    "sliceRecordCount": 3,
                    "column": [{"type": "string", "value": "X", "name": "c0"}]}},
                "writer": {"name": "streamwriter", "parameter": {}},
            }],
        }
    }))
    out = run_job(spark, cfg, hooks=[post_rec], pre_hooks=[pre_rec, pre_boom])
    assert out["rows"] == 6  # failing pre hook is log-and-continue
    assert order[0] == ("pre", "streamreader") and order[-1] == ("post", 6)
    assert out["pre_hooks"][0] == {"hook": "pre_rec", "ok": True}
    assert out["pre_hooks"][1]["ok"] is False and "RuntimeError" in out["pre_hooks"][1]["error"]

    # streaming entry point: pre hooks fire before the query starts
    base = str(tmp_path)
    src, root, ckpt = f"{base}/src", f"{base}/table", f"{base}/ckpt"
    _seed_changes(spark, src, _mk_rows([
        (1, "I", "http://a.example/x", "2024-01-01 00:00:00", "en"),
    ]))
    schema = T.StructType([f for f in CHANGE_SCHEMA.fields if f.name not in ("lsn", "op")])
    LakeTable.create(spark, root, schema, key_col="url", num_buckets=2)
    stream_order = []

    def s_pre(job_doc):
        stream_order.append(("pre", job_doc["table_root"]))

    def s_post(job_doc, summary):
        stream_order.append(("post", summary["batches_applied"]))

    q = run_stream(spark, src, root, ckpt, available_now=True,
                   timeout_sec=120, hooks=[s_post], pre_hooks=[s_pre, pre_boom])
    assert stream_order[0] == ("pre", root) and stream_order[-1][0] == "post"
    assert q.datax_pre_hook_results[0] == {"hook": "s_pre", "ok": True}
    assert q.datax_pre_hook_results[1]["ok"] is False
