"""spark-submit --py-files ship path (north rule): the packaged zip must be
importable by a fresh spark-submit JVM and reproduce the flagship pipeline.
Opt-in (-m slow): spawns its own subprocess JVM (~1 min)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

JOB = """
import sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.appName("nemo_spark_submit_smoke").getOrCreate()
from nemo_spark.kg.pipeline import materialized_triples, run_pipeline
from nemo_spark.kg.transcripts import transcripts_from_documents

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
n = materialized_triples(run_pipeline(spark, transcripts_from_documents(docs))).count()
print(f"SUBMIT_SMOKE_TRIPLES={n}")
spark.stop()
sys.exit(0)
"""


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        pytest.skip("spark-submit not on this host")
    subprocess.run(["bash", os.path.join(REPO, "package.sh")], check=True, cwd=REPO)
    job = tmp_path / "job.py"
    job.write_text(JOB)
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[8]",
            "--py-files",
            os.path.join(REPO, "nemo_spark.zip"),
            str(job),
        ],
        capture_output=True,
        text=True,
        timeout=280,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert "SUBMIT_SMOKE_TRIPLES=369" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
