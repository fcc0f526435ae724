"""North-rule scaling evidence through the REAL cluster entry point.

The rule says: "run via spark-submit --py-files on a multi-executor
cluster at two cluster sizes (N and 4N executors) with throughput
scaling efficiency >= 0.8". ``bench.py`` measures N-vs-4N in-process
pyspark sessions; THIS tool runs the identical bounded replay through
``spark-submit --py-files dist/datax_spark.zip`` child processes — the
exact invocation a cluster operator would use (reference analog:
``core/src/main/bin/datax.py`` launching the packaged engine), with the
repo scrubbed from PYTHONPATH so ``datax_spark.*`` resolves ONLY from
the shipped archive, on the driver and inside the Arrow UDF workers.

No real multi-node cluster exists in this sandbox, so "two cluster
sizes" is evidenced as two parallelism levels (``local[N]`` /
``local[4N]``) per the documented plan in BASELINE.md: same input
bytes, fresh JVM per size, efficiency = (T_N / T_4N) / 4.

Measurement hygiene (this host's cross-run variance has measured up to
50% between identical runs 15 min apart):

- the two arms run as INTERLEAVED pairs (4N, N, 4N, N, ...) and each
  arm takes its min — drift hits both arms, not one;
- a fixed-TOTAL-work md5 burn runs at BOTH widths inside every pair
  (pure CPU, zero shared state, no Spark): its N/4N ratio is the
  host's own maximum speedup in that window, and
  ``efficiency_net_of_host`` = (t_N/t_4N) / that ceiling isolates the
  engine's scaling from the shared-DRAM wall a single box imposes on
  the wide arm. On a real 4N-executor cluster the ceiling term is ~4.0
  (each executor brings its own memory channels/NIC).

Usage::

    python tools/submit_scaling.py [n_events] [n_small] [n_big] [pairs]

Defaults: 3,200,000 events (the sf0.1 bench scale), 8 and 32 cores,
3 pairs. Prints ONE JSON line compatible with BENCH.md's scaling table.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The runner executed by each spark-submit child: builds its session from
# the submit-provided conf, then runs bench.py's replay protocol (warmup
# replay into a throwaway table, then 2 timed reps, min) — duplicated
# here rather than imported because the child's python path contains ONLY
# the zip: proving the packaged artifact is self-sufficient is the point.
RUNNER = r'''
import json, shutil, sys, time
from pyspark.sql import functions as F, types as T

input_path, table_root, n_events, cores = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
# Session via the PACKAGED factory — the session-level tuning
# (zstd shuffle codec, AQE, Arrow batch cap for KB-scale html rows)
# is part of the engine, so the packaged entry point must carry it
# too; a bare getOrCreate() here measured 0.45 efficiency purely
# because the children silently ran lz4 + 10k-row Arrow batches.
# Mirrors bench.py's _session (cores*4 shuffle partitions).
from datax_spark.session import get_spark

spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4,
                  app_name=f"submit_replay_{cores}")
from datax_spark.cdc.apply import apply_changes
from datax_spark.functions.extract import with_enrichment
from datax_spark.lake.table import LakeTable

N_BATCHES, NUM_BUCKETS = 2, 64
schema = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("lang_id", T.StringType(), True),
    T.StructField("n_tokens", T.LongType(), True),
    T.StructField("quality", T.DoubleType(), True),
    T.StructField("fp", T.LongType(), True),
])
ch = spark.read.parquet(input_path)
# warmup exists for JIT/codegen/Arrow-channel spin-up, not measurement —
# a bounded slice suffices, and at sf1 (32M events) a full-size warmup
# would double every arm's cost
warm_hi = min(n_events, 4_000_000)
wt = LakeTable.create(spark, table_root + "_warm", schema, key_col="url",
                      num_buckets=NUM_BUCKETS)
apply_changes(wt, ch.filter(F.col("lsn") <= warm_hi), batch_id=0,
              transform=with_enrichment)
shutil.rmtree(table_root + "_warm", ignore_errors=True)
per = n_events // N_BATCHES
times = []
for rep in range(1):  # one timed rep per child; reps come from interleaved pairs
    t = LakeTable.create(spark, f"{table_root}_r{rep}", schema, key_col="url",
                         num_buckets=NUM_BUCKETS)
    t0 = time.time()
    for b in range(N_BATCHES):
        hi = (b + 1) * per if b < N_BATCHES - 1 else n_events + 1
        batch = ch.filter((F.col("lsn") > b * per) & (F.col("lsn") <= hi))
        apply_changes(t, batch, batch_id=b, transform=with_enrichment)
    times.append(time.time() - t0)
    shutil.rmtree(f"{table_root}_r{rep}", ignore_errors=True)
print("SUBMIT_REPLAY " + json.dumps({"replay_sec": min(times)}))
'''


def _find_spark_submit() -> str:
    p = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(p):
        raise SystemExit("no spark-submit on this host")
    return p


def _submit_replay(submit: str, zip_path: str, runner: str, cores: int,
                   input_path: str, table_root: str, n_events: int,
                   workdir: str) -> float:
    env = dict(os.environ, PYTHONPATH="")  # zip must be the only source
    r = subprocess.run(
        [
            submit,
            "--master", f"local[{cores}]",
            # session-level confs come from the packaged get_spark inside
            # the runner; only JVM-launch-level settings belong here
            "--conf", "spark.driver.memory=24g",
            "--conf", ("spark.driver.extraJavaOptions="
                       "-Xms24g -XX:+AlwaysPreTouch "
                       "-XX:+UnlockDiagnosticVMOptions "
                       "-XX:GCLockerRetryAllocationCount=64"),
            "--conf", f"spark.local.dir={workdir}/spark_local",
            "--py-files", zip_path,
            runner, input_path, table_root, str(n_events), str(cores),
        ],
        capture_output=True, text=True, cwd=workdir, env=env,
        timeout=max(3600, n_events // 1000),
    )
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-6000:])
        raise SystemExit(f"spark-submit local[{cores}] failed rc={r.returncode}")
    line = next(l for l in r.stdout.splitlines() if l.startswith("SUBMIT_REPLAY "))
    return json.loads(line[len("SUBMIT_REPLAY "):])["replay_sec"]


def _burn(_):
    import hashlib

    h = b"x"
    for _ in range(1_000_000):
        h = hashlib.md5(h).digest()
    return 0


def _host_speedup(n_small: int, n_big: int, units: int = 64) -> tuple[float, float]:
    """(T_burn@n_small, T_burn@n_big) for the same total work — the
    host's max achievable t_N/t_4N in this window."""
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(n_small) as p:
        p.map(_burn, range(units))
    t_small = time.time() - t0
    t0 = time.time()
    with mp.Pool(n_big) as p:
        p.map(_burn, range(units))
    return t_small, time.time() - t0


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    submit = _find_spark_submit()

    base = tempfile.mkdtemp(prefix="datax_submit_scaling_", dir="/dev/shm")
    try:
        sys.path.insert(0, REPO)
        from tools.package import build

        zip_path = build(os.path.join(base, "dist"))
        runner = os.path.join(base, "runner.py")
        with open(runner, "w") as f:
            f.write(RUNNER)

        # deterministic input written once, shared bytes for both submit
        # children. The generator runs in ITS OWN python subprocess: a
        # py4j gateway JVM lives until its python parent exits, so an
        # in-process session here would leave a ~GBs-RSS JVM alive
        # through every measured arm (observed in the sf1 run).
        gen_code = (
            "import sys\n"
            "from datax_spark.cdc.generator import changes_df\n"
            "from datax_spark.session import get_spark\n"
            "n, nb, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]\n"
            "spark = get_spark(master=f'local[{nb}]', app_name='submit_scaling_gen')\n"
            "# html_paragraphs=20 = bench.py's HTML_PARAGRAPHS (~2.8 KB pages),\n"
            "# so the per-event numbers are directly comparable to BENCH.md\n"
            "changes_df(spark, n, n_keys=max(1000, n // 4), partitions=nb,\n"
            "           html_paragraphs=20).write.parquet(out)\n"
        )
        r = subprocess.run(
            [sys.executable, "-c", gen_code, str(n_events), str(n_big),
             f"{base}/changes"],
            capture_output=True, text=True, timeout=3600,
            env=dict(os.environ, PYTHONPATH=REPO),
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            raise SystemExit("input generation failed")

        big_times, small_times, burns_small, burns_big = [], [], [], []
        for k in range(pairs):
            bs, bb = _host_speedup(n_small, n_big)
            burns_small.append(bs)
            burns_big.append(bb)
            big_times.append(_submit_replay(
                submit, zip_path, runner, n_big,
                f"{base}/changes", f"{base}/t4n_{k}", n_events, base))
            small_times.append(_submit_replay(
                submit, zip_path, runner, n_small,
                f"{base}/changes", f"{base}/tn_{k}", n_events, base))
            sys.stderr.write(
                f"pair {k}: t_{n_big}={big_times[-1]:.1f}s "
                f"t_{n_small}={small_times[-1]:.1f}s "
                f"burn {bs:.1f}/{bb:.1f}s\n")
        t_big, t_small = min(big_times), min(small_times)
        host_speedup = min(burns_small) / min(burns_big)
        ratio = n_big / n_small
        out = {
            "metric": "spark_submit_replay_scaling",
            "entry": "spark-submit --py-files dist/datax_spark.zip",
            "n_change_events": n_events,
            "pairs": pairs,
            "scaling": {
                "n_cores": n_small,
                "4n_cores": n_big,
                "t_n_sec": round(t_small, 2),
                "t_4n_sec": round(t_big, 2),
                "t_n_all": [round(t, 2) for t in small_times],
                "t_4n_all": [round(t, 2) for t in big_times],
                "efficiency": round((t_small / t_big) / ratio, 3),
                # host's own max N->4N speedup in this window (fixed-work
                # md5 burn at both widths, no Spark, no shared state) and
                # the fraction of it the engine captures
                "host_speedup_n_to_4n": round(host_speedup, 3),
                "efficiency_net_of_host": round(
                    (t_small / t_big) / host_speedup, 3),
            },
            "events_per_sec_4n": round(n_events / t_big),
            "events_per_sec_n": round(n_events / t_small),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
