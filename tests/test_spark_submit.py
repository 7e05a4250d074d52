"""REAL `spark-submit --py-files` integration (r6): the north_rule's
stated launch mode ("run via spark-submit --py-files on a multi-executor
cluster") executed literally — a fresh driver JVM via the spark-submit
shell, the package shipped ONLY as the built zip (cwd outside the repo, no
sys.path crutch), the flagship job writing a result store, and a second
submit with the same --run-id proving checkpoint resume. Everything else
in the suite drives the library in-process; this is the one test that
exercises the deployment artifact itself.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _submit(zip_path: str, tmp_path, *args: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "scripts", "run_extraction.py"), *args],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),  # NOT the repo: the zip must carry the package
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end_with_resume(spark, tmp_path):
    from pyspark.sql import functions as F

    from space_launch_telemetry_analyzer_spark.session import build_pyfiles_zip
    from space_launch_telemetry_analyzer_spark.sources.pages import (
        synth_pages_df,
    )

    pages_path = str(tmp_path / "pages")
    out = str(tmp_path / "results")
    synth_pages_df(spark, 400, partitions=2).select(
        "url", "warc_ts", "html", "text", "lang").write.parquet(pages_path)
    zip_path = build_pyfiles_zip(str(tmp_path / "pkg.zip"))

    s1 = _submit(zip_path, tmp_path, "--pages", pages_path, "--out", out,
                 "--run-id", "it-1", "--buckets", "8", "--no-audit")
    assert s1["n_results"] == 400 and s1["n_errors"] == 0
    assert s1["n_skipped_buckets"] == 0

    # byte-identity survives the deployment boundary too
    res = spark.read.parquet(os.path.join(out, "results"))
    truth = spark.read.parquet(pages_path).select("url", "text")
    assert res.count() == 400
    assert res.join(truth, "url").where(
        F.col("extracted_text") != F.col("text")).count() == 0

    # resume: same run-id re-submitted writes nothing new (bucket-level
    # checkpoint anti-join skips completed buckets)
    s2 = _submit(zip_path, tmp_path, "--pages", pages_path, "--out", out,
                 "--run-id", "it-1", "--buckets", "8", "--no-audit")
    assert s2["n_results"] == 0
    assert s2["n_skipped_buckets"] == 8
    assert spark.read.parquet(os.path.join(out, "results")).count() == 400
