"""Interleaved A/B: spark.io.compression.zstd.level 1 (default) vs 3 on
the bulk CoW replay, each arm a FRESH subprocess JVM (codec config is
session-wide), both orderings, min-of-pair reported.

Motivation (BENCH.md §zstd): the 4N arm is shared-bandwidth bound, so a
higher zstd level (better ratio, more CPU) could buy 4N wall time with
idle CPU — but the N arm is CPU-bound, so the same change could hurt
T_N and with it the scaling-efficiency numerator. This harness measures
the 4N arms; run with CORES=8 for the N side.

Usage: python tools/ab_zstd_level.py [cores] [events_per_row]
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EPR = int(sys.argv[2]) if len(sys.argv) > 2 else 32
BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def run_arm(level: int, input_path: str, base: str, n_events: int, tag: str) -> float:
    env = dict(os.environ)
    env["DATAX_SPARK_EXTRA_CONF"] = f"spark.io.compression.zstd.level={level}"
    t0 = time.time()
    child = subprocess.run(
        [sys.executable, BENCH, "--replay-child", str(CORES),
         input_path, f"{base}/t_{tag}", str(n_events), "cow"],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    if child.returncode != 0:
        sys.stderr.write(child.stderr[-3000:])
        raise RuntimeError(f"arm {tag} failed")
    t = json.loads(child.stdout.strip().splitlines()[-1])["replay_sec"]
    print(f"[{time.strftime('%H:%M:%S')}] level={level} ({tag}): {t:.2f}s "
          f"(wall {time.time()-t0:.0f}s)", flush=True)
    return t


def main():
    from datax_spark.session import get_spark
    from datax_spark.cdc.generator import changes_df

    base = tempfile.mkdtemp(prefix="ab_zstd_", dir="/dev/shm")
    spark = get_spark(master=f"local[{CORES}]")
    sf_rows = spark.read.parquet("/root/testdata/sf0.1/events.parquet").count()
    n_events = sf_rows * EPR
    changes_df(spark, n_events, n_keys=max(1000, n_events // 4),
               partitions=CORES, html_paragraphs=20).write.parquet(f"{base}/ch")
    spark.stop()
    time.sleep(1)

    results = {1: [], 3: []}
    # both orderings: (1,3,1,3) then (3,1,3,1)
    for batch, order in enumerate(([1, 3, 1, 3], [3, 1, 3, 1])):
        for i, lvl in enumerate(order):
            results[lvl].append(run_arm(lvl, f"{base}/ch", base, n_events, f"b{batch}i{i}"))
    print(json.dumps({
        "cores": CORES, "n_events": n_events,
        "level1": results[1], "level3": results[3],
        "level1_min": min(results[1]), "level3_min": min(results[3]),
    }))
    import shutil
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
