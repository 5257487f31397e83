"""spark-submit --py-files packaging (BASELINE.json:14): build + search
through the real CLI entry points with the engine shipped as a zip —
run from a scratch cwd so only the zip provides the package."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark-4.1.2-bin-hadoop3"), "bin", "spark-submit"
)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not found")
def test_submit_build_and_search(tmp_path):
    zip_path = str(tmp_path / "xsearch_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py"), zip_path],
        check=True,
        capture_output=True,
    )
    idx = str(tmp_path / "idx")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    common = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
    ]
    out = subprocess.run(
        common
        + [
            os.path.join(REPO, "scripts", "build_index_submit.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", idx,
            "--text-col", "text",
            "--variant", "base",
            "--docs-per-segment", "128",
            "--num-buckets", "16",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    status = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert status["status"] == "ok" and status["n_docs"] == 500

    out = subprocess.run(
        common
        + [
            os.path.join(REPO, "scripts", "search_submit.py"),
            "--index", idx,
            "--query", "hash join",
            "--k", "5",
            "--num-buckets", "16",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    results = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(results) == 5
    assert results[0]["rank"] == 1 and results[0]["doc_id"] == 169  # golden q03 top hit
