"""The north-star invocation, end-to-end: ``spark-submit --py-files
datax_spark.zip`` in a FRESH JVM whose python path does NOT contain the
repo — the zip is the only way ``datax_spark.*`` can resolve, on the
driver AND inside the Arrow pandas-UDF workers (the extractor closure is
serialized by reference, so executors must import the module from the
shipped archive; reference analog: ``core/src/main/bin/datax.py:33-37``
launching the packaged engine jar).

Skipped when no spark-submit binary is on this host.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit")
    else None
)

RUNNER = '''
import json, sys
from pyspark.sql import SparkSession, functions as F

spark = SparkSession.builder.getOrCreate()  # master/conf from spark-submit
from datax_spark.cdc.apply import apply_changes
from datax_spark.cdc.generator import changes_df
from datax_spark.functions.extract import with_enrichment
from datax_spark.lake.table import LakeTable
from pyspark.sql import types as T

root = sys.argv[1]
changes = changes_df(spark, 2000, n_keys=500, partitions=4, html_paragraphs=2)
schema = T.StructType([f for f in changes.schema.fields
                       if f.name not in ("lsn", "op")]
                      + [T.StructField(n, t, True) for n, t in
                         (("text", T.StringType()), ("lang_id", T.StringType()),
                          ("n_tokens", T.IntegerType()), ("quality", T.DoubleType()),
                          ("fp", T.LongType()))])
table = LakeTable.create(spark, root, schema, key_col="url", num_buckets=8)
summary = apply_changes(table, changes, batch_id=1, stream_id="submit-e2e",
                        transform=with_enrichment)
final = table.load().read()
n = final.count()
n_text = final.where(F.col("text").isNotNull()).count()
print("SUBMIT_E2E " + json.dumps({"rows": n, "rows_with_text": n_text,
                                  "merged": summary.get("applied", summary.get("merged", None))},
                                 default=str))
'''


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on host")
def test_spark_submit_py_files_cdc_merge(tmp_path):
    from tools.package import build

    zip_path = build(str(tmp_path / "dist"))
    runner = tmp_path / "runner.py"
    runner.write_text(RUNNER)
    env = dict(os.environ, PYTHONPATH="")
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(runner), str(tmp_path / "lake"),
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    line = next(l for l in r.stdout.splitlines() if l.startswith("SUBMIT_E2E "))
    out = json.loads(line[len("SUBMIT_E2E "):])
    # 2000 events over 500 keys, ~60% inserts: the final table holds the
    # LWW-surviving keys and EVERY row carries extractor output (the
    # pandas-UDF ran on workers -> zip resolved remotely)
    assert out["rows"] > 100
    assert out["rows_with_text"] == out["rows"]
