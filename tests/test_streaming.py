"""Structured Streaming path: file-source change stream -> foreachBatch
replay into the lake table; checkpoint + ledger resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.sources import (
    change_stream,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
    lww_dedupe,
)

BASE = 1_600_000_000_000
N = 4_000


def test_stream_foreachbatch_matches_oracle(spark, tmp_path):
    events = change_stream(spark, N, n_repos=50, paths_per_repo=5)
    src = str(tmp_path / "incoming")
    # two source files arriving over time (binlog tail)
    events.filter(F.col("timestamp") < BASE + N // 2).write.parquet(
        src + "/f1.parquet"
    )
    events.filter(F.col("timestamp") >= BASE + N // 2).write.parquet(
        src + "/f2.parquet"
    )

    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(table=table, chain=Chain([]), epoch="s1")
    stream_df = spark.readStream.schema(events.schema).parquet(src + "/*")
    q = rep.stream(
        stream_df, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    final = table.read(spark)
    oracle = repositories_snapshot(spark, events)
    assert final.count() == oracle.count()
    joined = final.select("repo", "path", F.sha2("content", 256).alias("h")).join(
        oracle.select("repo", "path", F.sha2("content", 256).alias("h2")),
        ["repo", "path"],
        "full_outer",
    )
    assert joined.filter("h IS NULL OR h2 IS NULL OR h != h2").count() == 0

    # restart the stream over the same checkpoint: nothing new -> no-op
    q2 = rep.stream(
        spark.readStream.schema(events.schema).parquet(src + "/*"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(120)
    assert table.read(spark).count() == oracle.count()


def test_salted_dedupe_equivalence(spark):
    events = change_stream(spark, 5_000, n_repos=10, paths_per_repo=2)
    plain = lww_dedupe(events).select("key", "value.lsn").orderBy("key")
    salted = lww_dedupe(events, n_salt=8).select("key", "value.lsn").orderBy("key")
    assert plain.collect() == salted.collect()
