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
