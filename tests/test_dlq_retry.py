"""DLQ reprocessing: quarantine → fix the chain → retry_dlq. The money
test: quarantined DELETES age while the live pipeline keeps upserting;
the stale-LSN guard must apply exactly the deletes that are still the
key's newest event — final state equals the full LWW oracle over ALL
events, as if nothing had ever errored."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.sources import change_stream
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
    read_dlq,
    retry_dlq,
)

BASE = 1_600_000_000_000
N = 4_000


@pytest.fixture(scope="module")
def events(spark):
    return change_stream(spark, N, n_repos=30, paths_per_repo=4).cache()


def _types(events):
    return (events.schema["key"].dataType, events.schema["value"].dataType)


# chain v1: hash(after.content) errors on rows with NULL content — i.e.
# every DELETE envelope (after is null) — so all deletes quarantine and
# the live table only ever sees upserts
CHAIN_V1 = [
    {"type": "tombstone_handler", "behavior": "drop_silent"},
    {"type": "hash", "field.name": "after.content", "function": "sha256"},
]
# the fix: skip missing/null instead of erroring
CHAIN_V2 = [
    {"type": "tombstone_handler", "behavior": "drop_silent"},
    {"type": "hash", "field.name": "after.content", "function": "sha256",
     "skip.missing.or.null": True},
]


@pytest.fixture()
def quarantined(spark, events, tmp_path):
    table = LakeTable(str(tmp_path / "t"), n_buckets=8,
                      merge_strategy="broadcast", discovery=False)
    dlq_dir = str(tmp_path / "dlq")
    rep = Replayer(table=table, chain=Chain(CHAIN_V1), epoch="e",
                   error_mode="dlq", dlq_dir=dlq_dir)
    rep.replay(events, batch_width=1_000, start_pos=BASE, max_pos=BASE + N)
    return table, dlq_dir


def _winner_deletes(events, batch_width=1_000):
    """Per (batch, key) LWW winners that are deletes — exactly the rows
    the engine's pushdown lets reach the erroring stage (non-winner
    rows are superseded within their batch and never touch state)."""
    w = Window.partitionBy(
        F.floor((F.col("timestamp") - BASE) / batch_width),
        "key.repo", "key.path",
    ).orderBy(F.desc("value.lsn"))
    return (
        events.filter(F.col("value").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND value.op = 'd'")
    )


def test_read_dlq_parses_envelopes(spark, events, quarantined):
    table, dlq_dir = quarantined
    kt, vt = _types(events)
    env = read_dlq(spark, dlq_dir, key_type=kt, value_type=vt)
    n_expected = _winner_deletes(events).count()
    assert env.count() == n_expected > 0
    assert env.filter(F.col("value.op") != "d").count() == 0
    assert env.filter(F.col("error").isNull()).count() == 0
    # envelope shape round-trips (key + lsn intact)
    assert env.filter(F.col("key.repo").isNull()).count() == 0
    assert env.filter(F.col("value.lsn").isNull()).count() == 0


def test_read_dlq_empty_dir_is_empty_frame(spark, events, tmp_path):
    kt, vt = _types(events)
    env = read_dlq(spark, str(tmp_path / "nothing"), key_type=kt, value_type=vt)
    assert env.count() == 0 and "error" in env.columns


def test_retry_applies_only_non_stale_deletes(spark, events, quarantined):
    table, dlq_dir = quarantined
    kt, vt = _types(events)
    rep_fixed = Replayer(table=table, chain=Chain(CHAIN_V2), epoch="e")
    out = retry_dlq(spark, dlq_dir, replayer=rep_fixed,
                    key_type=kt, value_type=vt)
    assert not out.get("skipped") and out["n_retried"] > 0

    # final state == LWW over ALL events (deletes included), i.e. as if
    # the chain had been correct from the start
    w = Window.partitionBy("key.repo", "key.path").orderBy(
        F.desc("value.lsn")
    )
    winners = (
        events.filter(F.col("value").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND value.op != 'd'")
        .select(
            F.col("key.repo").alias("repo"),
            F.col("key.path").alias("path"),
            F.col("value.lsn").alias("lsn"),
        )
    )
    final = table.read(spark).select("repo", "path", "_lsn")
    cmp = final.join(winners, ["repo", "path"], "full_outer")
    assert cmp.filter("_lsn IS NULL OR lsn IS NULL OR _lsn != lsn").count() == 0
    # the guard measurably dropped the deletes that aged out, and some
    # deletes survived (keys whose newest event really was the delete)
    n_quarantined = _winner_deletes(events).count()
    assert 0 < out["n_stale_dropped"] < n_quarantined


def test_retry_marks_and_second_retry_skips(spark, events, quarantined):
    table, dlq_dir = quarantined
    kt, vt = _types(events)
    rep_fixed = Replayer(table=table, chain=Chain(CHAIN_V2), epoch="e")
    retry_dlq(spark, dlq_dir, replayer=rep_fixed, key_type=kt, value_type=vt)
    # marker filters the quarantine; a second retry is a no-op
    assert read_dlq(spark, dlq_dir, key_type=kt, value_type=vt).count() == 0
    again = retry_dlq(spark, dlq_dir, replayer=rep_fixed,
                      key_type=kt, value_type=vt, batch_id=1)
    assert again["skipped"] and again["n_retried"] == 0
    # include_retried=True still shows the history
    assert read_dlq(spark, dlq_dir, key_type=kt, value_type=vt,
                    include_retried=True).count() > 0


def test_retry_with_still_broken_chain_aborts_unmarked(
    spark, events, quarantined
):
    table, dlq_dir = quarantined
    kt, vt = _types(events)
    rep_broken = Replayer(table=table, chain=Chain(CHAIN_V1), epoch="e")
    with pytest.raises(DataException):
        retry_dlq(spark, dlq_dir, replayer=rep_broken,
                  key_type=kt, value_type=vt)
    # nothing marked: the quarantine is still fully visible
    assert read_dlq(spark, dlq_dir, key_type=kt, value_type=vt).count() > 0


def test_cli_retry_dlq_end_to_end(spark, tmp_path):
    """Ops surface: CLI replay in dlq mode (broken chain) -> CLI
    --maintenance retry-dlq (fixed chain) -> final state equals the
    full LWW oracle."""
    import json as _json
    import os as _os
    import subprocess
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    n = 2_000
    ev = change_stream(spark, n, n_repos=20, paths_per_repo=4)
    ev.write.mode("overwrite").parquet(str(tmp_path / "events"))
    (tmp_path / "v1.json").write_text(_json.dumps(CHAIN_V1))
    (tmp_path / "v2.json").write_text(_json.dumps(CHAIN_V2))
    env = dict(_os.environ, PYTHONPATH=repo)
    common = [
        _sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
        "--table", str(tmp_path / "t"), "--buckets", "4",
        "--master", "local[4]", "--merge-strategy", "broadcast",
        "--no-discovery",
    ]
    out = subprocess.run(
        common + [
            "--events", str(tmp_path / "events"),
            "--chain", str(tmp_path / "v1.json"),
            "--batches", "2",
            "--error-mode", "dlq", "--dlq-dir", str(tmp_path / "dlq"),
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert _os.path.isdir(str(tmp_path / "dlq"))

    vt = ("op string, lsn bigint, ts_ms bigint, "
          "before struct<repo:string,path:string,commit:string,"
          "lang:string,content:string>, "
          "after struct<repo:string,path:string,commit:string,"
          "lang:string,content:string>")
    out2 = subprocess.run(
        common + [
            "--maintenance", "retry-dlq",
            "--chain", str(tmp_path / "v2.json"),
            "--dlq-dir", str(tmp_path / "dlq"),
            "--dlq-key-type", "repo string, path string",
            "--dlq-value-type", vt,
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    summary = _json.loads(out2.stdout.strip().splitlines()[-1])
    assert summary.get("n_retried", 0) > 0

    w = Window.partitionBy("key.repo", "key.path").orderBy(F.desc("value.lsn"))
    winners = (
        ev.filter(F.col("value").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND value.op != 'd'")
    )
    table = LakeTable(str(tmp_path / "t"), n_buckets=4)
    assert table.read(spark).count() == winners.count()


def test_retry_cannot_resurrect_deleted_key(spark, tmp_path):
    """A key deleted by the live pipeline AFTER its upsert was
    quarantined must stay deleted: on changelog tables the guard folds
    in delete positions (a plain current-state lookup can't see them)."""
    import pyspark.sql.types as T

    kt = T.StructType([T.StructField("k", T.StringType())])
    vt = T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", T.StructType([T.StructField("v", T.StringType())])),
        T.StructField("after", T.StructType([T.StructField("v", T.StringType())])),
    ])
    env_t = T.StructType([
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("key", kt),
        T.StructField("value", vt),
        T.StructField("timestamp", T.LongType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
    ])

    def env(rows):
        return spark.createDataFrame(
            [("t", 0, (k,), (op, lsn, 0, None,
                             None if op == "d" else (v,)), lsn, None)
             for k, lsn, op, v in rows], env_t)

    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", discovery=False,
                      changelog=True)
    dlq_dir = str(tmp_path / "dlq")
    # wave 1: hash(after.v) errors per record when the value is null —
    # the victim upsert carries v=None, so it quarantines
    broken = Chain([{"type": "hash", "field.name": "after.v",
                     "function": "sha256"}])
    rep1 = Replayer(table=table, chain=broken, epoch="e",
                    error_mode="dlq", dlq_dir=dlq_dir)
    rep1.replay(env([("k1", 5, "u", None)]), batch_width=10,
                start_pos=0, max_pos=10)
    # later batches: a clean upsert MATERIALIZES k1, then a separate
    # batch deletes it (separate batches, so the delete has a pre-image
    # and lands in the changelog — the guard's information source)
    # distinct epoch: batch ids are per-epoch and wave 1 already
    # committed ("e", 0)
    rep2 = Replayer(table=table, chain=Chain([]), epoch="e2")
    rep2.replay(env([("k1", 12, "u", "x2"), ("k1", 19, "d", None)]),
                batch_width=5, start_pos=10, max_pos=30)
    assert table.read(spark).filter("k = 'k1'").count() == 0

    out = retry_dlq(
        spark, dlq_dir,
        replayer=Replayer(table=table, chain=Chain([]), epoch="e"),
        key_type=kt, value_type=vt,
    )
    assert out["n_stale_dropped"] == 1
    # the deleted key stays deleted — no resurrection
    assert table.read(spark).filter("k = 'k1'").count() == 0


def test_retry_chain_override(spark, events, quarantined):
    """retry_chain replaces the replayer's chain for the retry run
    (the mid-chain double-apply escape hatch)."""
    table, dlq_dir = quarantined
    kt, vt = _types(events)
    rep_broken = Replayer(table=table, chain=Chain(CHAIN_V1), epoch="e")
    out = retry_dlq(spark, dlq_dir, replayer=rep_broken,
                    key_type=kt, value_type=vt,
                    retry_chain=Chain(CHAIN_V2))
    assert out["n_retried"] > 0  # the override unblocked the retry
