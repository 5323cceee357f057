"""spark-submit --py-files deployment smoke (BASELINE.json
north_rule deployment shape): package the engine, run the flagship
job script through real spark-submit on a small input, then resume it
and confirm committed chunks are skipped."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path, spark, sf_dir):
    from s2spark.fixtures import points_df
    pts_path = str(tmp_path / "pts")
    points_df(spark, sf_dir).write.parquet(pts_path)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "make_pyfiles.py")],
        capture_output=True, text=True, check=True).stdout.strip()
    assert os.path.exists(zip_path)

    spark_submit = os.path.join(os.path.dirname(sys.executable),
                                "spark-submit")
    if not os.path.exists(spark_submit):
        import pyspark
        spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                    "bin", "spark-submit")
    out_dir = str(tmp_path / "out")
    cmd = [spark_submit, "--master", "local[2]",
           "--conf", "spark.ui.enabled=false",
           "--py-files", zip_path,
           os.path.join(ROOT, "scripts", "flagship_submit.py"),
           pts_path, out_dir, "2"]
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "2 computed, 0 resumed-over" in r.stdout

    manifest = json.load(open(os.path.join(out_dir,
                                           "_s2spark_manifest.json")))
    assert set(manifest["chunks"]) == {"0", "1"}

    # resume: rerunning skips every committed chunk
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "0 computed, 2 resumed-over" in r2.stdout
