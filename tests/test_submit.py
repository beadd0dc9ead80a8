"""Deployment shape (north rule): spark-submit --py-files with the packaged
engine, run from a foreign cwd so only the zip provides the package."""

import json
import os
import subprocess
import sys

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles_flagship(tmp_path):
    from tools.make_pyfiles_zip import build

    zip_path = build(str(tmp_path / "pkg.zip"))
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    out_dir = str(tmp_path / "out")
    res = subprocess.run(
        [
            submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "jobs", "flagship_job.py"),
            "--n-images",
            "2000",
            "--out",
            out_dir,
        ],
        cwd=str(tmp_path),  # NOT the repo: the zip must be self-sufficient
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    metrics = [json.loads(l) for l in res.stdout.splitlines() if l.startswith("{")]
    assert metrics and metrics[0]["job"] == "flagship" and metrics[0]["result_rows"] > 0
    # the committed level landed with its metrics sidecar
    assert os.path.exists(os.path.join(out_dir, "level=12", "_metrics.json"))
