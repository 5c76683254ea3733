"""The north rule's deployment contract: the engine runs via
``spark-submit --py-files`` with NO repo checkout on the "cluster".

The test zips ``moonlink_spark``, clears PYTHONPATH, and runs
``tools/submit_demo.py`` (full create -> append -> MERGE -> compact -> scan
lifecycle) from a temp cwd, so the package can only arrive through
``--py-files`` — driver imports AND executor-side UDF unpickling both have to
resolve from the shipped zip, exactly as on a real multi-executor cluster.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    return str(cand) if cand.exists() else None


def test_lifecycle_under_spark_submit_py_files(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH or in pyspark")

    zip_path = tmp_path / "moonlink_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / "moonlink_spark").rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    job = tmp_path / "submit_demo.py"
    shutil.copy(REPO / "tools" / "submit_demo.py", job)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    out = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            str(job), str(tmp_path / "tbl"), "200",
        ],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    result = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert result["ok"], result
    assert result["snapshots"] >= 3  # append, merge, compact
