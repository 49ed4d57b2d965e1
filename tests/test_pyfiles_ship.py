"""`spark-submit --py-files` shipping, end-to-end.

North-rule contract (BASELINE.json:6): "the whole pipeline ships via
spark-submit --py-files".  This test proves it with a REAL spark-submit:
the job script is copied OUT of the repo into a bare temp dir, PYTHONPATH
is stripped, and a control check asserts `import parquet_spark` fails in
that environment — so the only way the submitted job can import the
package is from the zip that make_pyfiles built.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def _clean_env():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    return env


@pytest.mark.slow
def test_spark_submit_py_files_ships_the_pipeline(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles
    zip_path = make_pyfiles.build(str(tmp_path / "parquet_spark.zip"))
    job_dir = tmp_path / "job"
    job_dir.mkdir()
    job = str(job_dir / "encode_job.py")
    shutil.copy(os.path.join(REPO, "scripts", "encode_job.py"), job)

    env = _clean_env()
    # control: without the zip, the package must NOT be importable from
    # this cwd/env — otherwise the spark-submit run proves nothing
    ctl = subprocess.run([sys.executable, "-c", "import parquet_spark"],
                         cwd=str(tmp_path), env=env, capture_output=True)
    assert ctl.returncode != 0, "parquet_spark leaked into the bare env"

    spark_submit = os.path.join(os.path.dirname(
        __import__("pyspark").__file__), "bin", "spark-submit")
    inp = os.path.join(TESTDATA, "sf0.001", "documents.parquet")
    out = subprocess.run(
        [spark_submit, "--py-files", zip_path,
         job, "--master", "local[4]", "--input", inp, "--key", "doc_id",
         "--parts", "4", "--warmup", "0", "--reps", "1",
         "--mode", "splits"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert out.returncode == 0, out.stderr[-4000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["rows"] > 0 and res["bytes_out"] > 0
    assert res["mode"] == "splits" and res["master"] == "local[4]"
