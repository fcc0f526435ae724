"""Build the ``--py-files`` artifact: ``dist/datax_spark.zip``.

Usage::

    python tools/package.py [out_dir]

Produces a zipimport-compatible archive (package directory at the zip
root, sources only) and prints the cluster invocation it is built for:

    spark-submit --py-files dist/datax_spark.zip \
        --master <cluster> [--num-executors N|4N ...] \
        run_job.py job.json

where ``run_job.py`` can simply ``from datax_spark.__main__ import main``.
Executors unpack the zip onto their python path, so every pandas-UDF /
mapInPandas closure resolves ``datax_spark.*`` remotely — the packaging
contract the north-star's two-cluster-size runs assume.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_dir: str = "dist") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "datax_spark")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "datax_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, repo))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "dist")
    print(f"built {path}")
    print(f"spark-submit --py-files {path} run_job.py job.json")
