"""spark-submit --py-files deployment shape (north_rule): the package
is zipped, shipped via --py-files to a fresh spark-submit-launched
driver WITHOUT the repo on PYTHONPATH, replays a change stream
end-to-end, and the table it leaves behind matches the oracle. Proves
the engine deploys to a real cluster the way the rule names — the
import must resolve from the shipped zip, asserted via __file__."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.sources import (
    change_stream,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "transforms_for_apache_kafka_connect_spark"

SPARK_SUBMIT = shutil.which("spark-submit")

JOB = """\
import json, sys
import {pkg} as pkg
# the package must come from the --py-files zip, not a repo checkout
assert ".zip" in pkg.__file__, pkg.__file__
from {pkg}.cli import main
print(json.dumps({{"pkg_file": pkg.__file__}}))
sys.exit(main())
"""


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "tkc_pkg.zip")
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_replay(spark, tmp_path):
    n = 2_000
    events = change_stream(spark, n, n_repos=20, paths_per_repo=5)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    chain_spec = [
        {"type": "tombstone_handler", "behavior": "drop_silent"},
        {"type": "filter_by_field_value", "field.name": "op",
         "field.value": "r", "field.value.matches": False},
    ]
    (tmp_path / "chain.json").write_text(json.dumps(chain_spec))
    (tmp_path / "job.py").write_text(JOB.format(pkg=PKG))
    zpath = _zip_package(str(tmp_path))

    # scrub any repo path so ONLY --py-files can satisfy the import
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            str(tmp_path / "job.py"),
            "--events", str(tmp_path / "events"),
            "--table", str(tmp_path / "table"),
            "--chain", str(tmp_path / "chain.json"),
            "--batches", "2",
            "--buckets", "4",
            "--merge-strategy", "broadcast",
            "--no-discovery",
        ],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [
        json.loads(s) for s in out.stdout.strip().splitlines()
        if s.startswith("{")
    ]
    pkg_file = next(d["pkg_file"] for d in lines if "pkg_file" in d)
    assert ".zip" in pkg_file  # imported from the shipped artifact
    summary = next(d for d in lines if "applied" in d)
    assert summary["applied"] == 2 and summary["skipped"] == 0

    table = LakeTable(str(tmp_path / "table"), n_buckets=4)
    final = table.read(spark)
    oracle = repositories_snapshot(
        spark, events.filter(F.col("value").isNull() | (F.col("value.op") != "r"))
    )
    assert final.count() == oracle.count()
    shared = sorted(set(final.columns) & set(oracle.columns))
    assert shared  # content columns overlap

    def digest(df):  # decimal sum: xxhash64 values overflow ANSI long
        return df.select(
            F.sum(F.xxhash64(*shared).cast("decimal(38,0)"))
        ).first()[0]

    assert digest(final) == digest(oracle)
