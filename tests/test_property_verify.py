"""Property law (hypothesis): for ANY tamper set (deleted keys,
changed payloads, invented rows), `repair_state` drives the table to
exactly the expected frame — verified by `table_diff` == empty — and
repairing BACK restores the original state bit-for-bit. The same table
serves every example because each example round-trips it."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.sources import change_stream
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
    repair_state,
    table_diff,
)


@pytest.fixture(scope="module")
def rig(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("repair_prop")
    t = LakeTable(str(tmp / "t"), n_buckets=4, discovery=False,
                  merge_strategy="broadcast")
    Replayer(table=t, chain=Chain([]), epoch="v").apply_batch(
        change_stream(spark, 1_000, n_repos=15, paths_per_repo=4), 0
    )
    base_path = str(tmp / "base")
    t.read(spark).write.parquet(base_path)
    keys = [
        (r["repo"], r["path"])
        for r in spark.read.parquet(base_path)
        .select("repo", "path").orderBy("repo", "path").collect()
    ]
    return t, base_path, keys


counter = iter(range(1, 10_000))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_repair_roundtrip_any_tamper(spark, rig, data):
    t, base_path, keys = rig
    base = spark.read.parquet(base_path)
    n = len(keys)
    del_idx = data.draw(st.sets(st.integers(0, n - 1), max_size=4), "del")
    chg_idx = data.draw(st.sets(st.integers(0, n - 1), max_size=4), "chg")
    n_new = data.draw(st.integers(0, 3), "new")
    chg_idx -= del_idx

    def isin(idxs):
        if not idxs:
            return F.lit(False)
        return F.struct("repo", "path").isin(
            [F.struct(F.lit(keys[i][0]), F.lit(keys[i][1])) for i in idxs]
        )

    tag = next(counter)
    tampered = (
        base.filter(~isin(del_idx))
        .withColumn(
            "content",
            F.when(isin(chg_idx), F.lit(f"tampered-{tag}"))
            .otherwise(F.col("content")),
        )
    )
    if n_new:
        extra = base.limit(1).select(
            F.lit(f"invented-{tag}").alias("repo"),
            *[c for c in base.columns if c != "repo"],
        )
        for i in range(n_new):
            tampered = tampered.unionByName(
                extra.withColumn("path", F.lit(f"p{i}"))
            )
    repair_state(spark, t, tampered, epoch=f"fwd{tag}")
    assert table_diff(spark, t, tampered).count() == 0
    # round-trip home: the table is bit-identical to the base again
    repair_state(spark, t, base, epoch=f"back{tag}")
    assert table_diff(spark, t, base).count() == 0
