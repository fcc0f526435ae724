"""CLI entry point: ``python -m datax_spark job.json`` — the analogue of
``datax.py job.json`` (``core/src/main/bin/datax.py:33-37``), running the
job on a local SparkSession; on a cluster the same module runs under
``spark-submit --py-files datax_spark.zip -m datax_spark job.json``-style
invocation (master/memory from spark-submit conf).
"""

from __future__ import annotations

import json
import sys

from datax_spark.config import run_job
from datax_spark.session import get_spark


def main(argv: list[str]) -> int:
    if len(argv) < 1:
        print("usage: python -m datax_spark <job.json> [--dry-run]", file=sys.stderr)
        return 2
    spark = get_spark(app_name="datax_spark_job")
    cfg_path = argv[0]
    from datax_spark.config import JobConfig

    cfg = JobConfig.from_json(cfg_path)
    if "--dry-run" in argv:
        cfg.dry_run = True
    result = run_job(spark, cfg)
    print(json.dumps(result, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
