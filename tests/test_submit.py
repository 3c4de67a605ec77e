"""spark-submit --py-files smoke test (north rule: jobs are submitted via
spark-submit to multi-executor clusters). Runs the real binary with the
packaged zip in a fresh JVM — proves the CLI entry, the zip layout, and
executor-side imports work outside any test harness session."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_cli_job(spark, tmp_path):
    from mhealth_spark import cli
    from mhealth_spark.synth import synth_tokens

    inp = str(tmp_path / "tokens.parquet")
    synth_tokens(spark, 200, seed=3).write.mode("overwrite").parquet(inp)

    zip_path = str(tmp_path / "pkg.zip")
    assert cli.main(["package", "--out", zip_path]) == 0

    out = str(tmp_path / "split_out")
    cli_file = os.path.abspath(cli.__file__)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            cli_file,
            "corpus-split",
            "--input", inp,
            "--output", out,
            "--master", "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = spark.read.parquet(out)
    assert got.count() == 200
    assert "split" in got.columns
