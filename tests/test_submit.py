"""spark-submit --py-files packaging: the north_rule deployment path.

Builds dist/geotreehealth_spark.zip, then runs the flagship job through a
REAL spark-submit subprocess whose PYTHONPATH contains only the zip (cwd is
a temp dir), proving executors resolve the engine from --py-files."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package_pyfiles

    zip_path = package_pyfiles.build(REPO, str(tmp_path / "geotreehealth_spark.zip"))
    assert os.path.getsize(zip_path) > 10_000
    spark_submit = "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "--sf-dir", "/root/testdata/sf0.001",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            result = json.loads(line)
    assert result and result["rows"] > 100 and result["hash"] != 0
