"""North-rule launch path: spark-submit --py-files ships the engine as
a zip and a driver that has the repo NOWHERE on sys.path runs it.
This is the exact cluster-deploy shape (tools/submit_example.sh) minus
the yarn master."""

from __future__ import annotations

import shutil
import subprocess
import zipfile

import pytest

REPO = "/root/repo"

_DRIVER = """
import sys
from pyspark.sql import SparkSession
assert not any("root/repo" in p for p in sys.path), sys.path
from wedge_parallel_triangle_counting_spark.operators.triangles import triangle_count
from wedge_parallel_triangle_counting_spark.operators.pagerank import pagerank
spark = SparkSession.builder.appName("submit-check").getOrCreate()
edges = spark.createDataFrame(
    [(a, b) for a in range(5) for b in range(a + 1, 5)], "src long, dst long"
)
tri = triangle_count(edges).collect()[0][0]
pr = pagerank(edges, num_iters=2).count()
print(f"SUBMIT_CHECK triangles={tri} pr_rows={pr}")
spark.stop()
"""


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_py_files_launch(tmp_path):
    zip_path = tmp_path / "engine.zip"
    pkg = f"{REPO}/wedge_parallel_triangle_counting_spark"
    with zipfile.ZipFile(zip_path, "w") as zf:
        import os

        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            str(zip_path),
            str(driver),
        ],
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "SUBMIT_CHECK triangles=10 pr_rows=5" in out.stdout, (
        out.stdout[-2000:],
        out.stderr[-2000:],
    )
