"""North-rule launch contract: the engine runs via `spark-submit
--py-files <gdal_spark.zip>` with NO repo on the executor path — the
package arrives through the py-files channel only."""

import json
import os
import shutil
import subprocess
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_flagship():
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    zip_path = shutil.make_archive(
        os.path.join(tempfile.mkdtemp(prefix="gdal_spark_zip_"), "gdal_spark"),
        "zip", REPO, "gdal_spark",
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "flagship_job.py"),
            "--rows", "200000", "--partitions", "16",
        ],
        cwd=tempfile.gettempdir(),  # NOT the repo
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["rows"] == 200000
    assert out["docs_per_sec"] > 0
