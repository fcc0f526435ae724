"""The --py-files artifact (tools/package.py) is zipimport-complete."""

import os
import subprocess
import sys


def test_zip_is_importable_standalone(tmp_path):
    from tools.package import build

    out = build(str(tmp_path))
    # a FRESH interpreter with ONLY the zip on its path must resolve the
    # whole package (catches missing submodules/data deps in the archive)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import datax_spark, datax_spark.config, datax_spark.lake.merge, "
        "datax_spark.cdc.pipeline, datax_spark.operators.dedup, "
        "datax_spark.sources.shardtail, datax_spark.functions.text; "
        "from datax_spark.config import JobConfig; "
        "print('zip-import-ok')"
    )
    env = dict(os.environ, PYTHONPATH="")
    r = subprocess.run([sys.executable, "-c", code, out],
                       capture_output=True, text=True, cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stderr
    assert "zip-import-ok" in r.stdout
