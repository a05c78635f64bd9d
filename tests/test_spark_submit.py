"""The north-rule deployment shape, actually exercised: spark-submit
--py-files with the packaged library, run OUTSIDE the repo so the
graphiti_spark import can only resolve through the shipped zip."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_py_files_deployment(tmp_path):
    zip_path = shutil.make_archive(
        str(tmp_path / "graphiti_spark"), "zip", root_dir=REPO,
        base_dir="graphiti_spark",
    )
    job = tmp_path / "job.py"  # copied out: repo dir is NOT on sys.path
    shutil.copy(f"{REPO}/jobs/build_graph_job.py", job)
    out = tmp_path / "graph-out"
    r = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[8]",
            "--py-files", zip_path, str(job),
            "--input", "/root/testdata/sf0.001",
            "--output", str(out), "--n-ranges", "2",
        ],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path),
        env={**os.environ, "SPARK_GRAFT_CPUS": "8",
             "SPARK_GRAFT_DRIVER_MEM": "4g"},
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
    payload = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert payload["ranges_processed"] == 2
    assert payload["n_edges"] > 0
    assert os.path.isdir(f"{out}/graph/edges")
