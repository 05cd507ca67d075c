"""Deployment-contract evidence (north rule: "run via spark-submit
--py-files on a multi-executor cluster"): package wtq as a zip, launch
a COLD driver script through the real spark-submit with --py-files,
and assert the pipeline runs end-to-end in that deployment shape.

This is the exact launch path a cluster run uses (swap --master
local[4] for yarn/k8s); the zip contains only wtq/*.py, so passing
proves the package carries no un-shippable state (no absolute paths,
no import-time filesystem writes outside tmp, no driver-only deps).
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pyspark

DRIVER = """
import sys
from wtq.generate import ensure_pages
from wtq.pipeline import decisions_view, run_pipeline
from pyspark.sql import SparkSession

spark = (SparkSession.builder.appName("wtq-submit-test")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
pages = ensure_pages(sys.argv[1])
res = run_pipeline(spark, pages, num_partitions=4)
n = decisions_view(res.decided).count()
kept = res.decided.filter("keep").count()
print(f"WTQ_SUBMIT_OK n={n} kept={kept}")
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = tmp_path / "wtq.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(repo, "wtq")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    p = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", str(zpath),
            "--conf", "spark.ui.enabled=false",
            str(driver), "/root/testdata/sf0.001",
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert p.returncode == 0, p.stderr[-3000:]
    marker = [ln for ln in p.stdout.splitlines() if ln.startswith("WTQ_SUBMIT_OK")]
    assert marker, (p.stdout[-2000:], p.stderr[-1000:])
    n = int(marker[0].split("n=")[1].split()[0])
    assert n > 0
