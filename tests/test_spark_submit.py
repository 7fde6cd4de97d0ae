"""The literal north-rule mechanism: `spark-submit --py-files kgpipe.zip`
runs the pipeline end-to-end in a FRESH JVM/driver (catches packaging and
import-layout regressions the in-process suite cannot)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    tdf = spark.createDataFrame(
        [("c1", 0, "user", "a neuron appears", None, None),
         ("c1", 1, "tool", "a fibroblast too", None, None)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    in_path = str(tmp_path / "transcripts")
    tdf.write.parquet(in_path)

    zip_path = str(tmp_path / "kgpipe.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "kgpipe")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))

    out = str(tmp_path / "triples")
    lin = str(tmp_path / "lineage")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        ["spark-submit", "--py-files", zip_path, "--master", "local[4]",
         os.path.join(REPO, "tools", "spark_submit_entry.py"),
         "--transcripts", in_path,
         "--obo", f"CL={os.path.join(REPO, 'tests', 'fixtures', 'mini.obo')}",
         "--out", out, "--lineage", lin, "--fused", "--buckets", "4"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    triples = spark.read.parquet(out)
    assert triples.count() >= 8
    preds = {r.pred for r in triples.select("pred").distinct().collect()}
    assert "http://purl.org/kgpipe/denotes" in preds
    lineage = spark.read.parquet(lin)
    assert {r.status for r in lineage.collect()} == {"COMPLETE"}
