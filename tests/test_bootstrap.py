"""Initial-snapshot bootstrap → incremental handoff (Debezium snapshot
phase analog: seed the table from a consistent source snapshot at LSN
S, then replay only events with lsn > S).

The key correctness property: bootstrap(snapshot@S) + replay(events)
must equal replay-from-scratch(events) — including when the replayed
stream still CONTAINS the pre-S events (the engine must drop them,
because the merge is source-wins and a stale pre-S delete would
otherwise regress seeded rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.sources.changestream import (
    change_stream,
    repositories_snapshot,
    snapshot_envelope,
)
from transforms_for_apache_kafka_connect_spark.streaming.engine import (
    BOOTSTRAP_BATCH_ID,
    Replayer,
)
from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable

BASE_TS = 1_600_000_000_000


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(r[c] for c in cols) for r in
            sorted(df.select(*cols).collect())]


def _final_state(table, spark):
    return table.read(spark).drop("_lsn")


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast", "append"])
def test_bootstrap_plus_incremental_equals_full_replay(
    spark, tmp_path, strategy
):
    n, cut = 4_000, 2_000
    events = change_stream(spark, n, n_repos=15, paths_per_repo=4)

    # consistent snapshot at LSN cut-1: LWW state over events[0..cut)
    snapshot = repositories_snapshot(
        spark, events.filter(F.col("value.lsn") < cut)
    )

    boot = LakeTable(str(tmp_path / "boot"), n_buckets=8,
                     merge_strategy=strategy)
    rep = Replayer(table=boot, chain=Chain([]), epoch="e")
    r = rep.bootstrap(snapshot, snapshot_lsn=cut - 1)
    assert not r.get("skipped") and r["batch_id"] == BOOTSTRAP_BATCH_ID
    assert boot.extra() == {"snapshot_lsn": cut - 1}

    # hand off to incremental replay of the WHOLE stream (pre-cut
    # events included — the engine must drop them itself)
    rep.replay(events, batch_width=(n + 1) // 2,
               start_pos=BASE_TS, max_pos=BASE_TS + n)

    full = LakeTable(str(tmp_path / "full"), n_buckets=8,
                     merge_strategy=strategy)
    Replayer(table=full, chain=Chain([]), epoch="e").replay(
        events, batch_width=(n + 1) // 2,
        start_pos=BASE_TS, max_pos=BASE_TS + n,
    )
    assert _sorted_rows(_final_state(boot, spark)) == _sorted_rows(
        _final_state(full, spark)
    )


def test_bootstrap_records_snapshot_lsn_and_is_idempotent(spark, tmp_path):
    events = change_stream(spark, 500, n_repos=5, paths_per_repo=3)
    snapshot = repositories_snapshot(spark, events)
    table = LakeTable(str(tmp_path / "t"), n_buckets=4)
    rep = Replayer(table=table, chain=Chain([]), epoch="e")

    r1 = rep.bootstrap(snapshot, snapshot_lsn=499)
    assert not r1.get("skipped")
    n_rows = table.read(spark).count()
    assert n_rows == snapshot.count() > 0
    # snapshot rows all carry the snapshot LSN (Debezium stamps the
    # single snapshot position, not per-row history)
    lsns = table.read(spark).select("_lsn").distinct().collect()
    assert [r["_lsn"] for r in lsns] == [499]

    # crash/retry: second call is a ledgered no-op
    r2 = rep.bootstrap(snapshot, snapshot_lsn=499)
    assert r2 == {"skipped": True, "batch_id": BOOTSTRAP_BATCH_ID}
    assert table.read(spark).count() == n_rows


def test_bootstrap_refuses_nonempty_table(spark, tmp_path):
    events = change_stream(spark, 300, n_repos=5, paths_per_repo=3)
    table = LakeTable(str(tmp_path / "t"), n_buckets=4)
    rep = Replayer(table=table, chain=Chain([]), epoch="e")
    rep.replay(events, batch_width=300,
               start_pos=BASE_TS, max_pos=BASE_TS + 300)
    with pytest.raises(ValueError, match="empty table"):
        rep.bootstrap(
            repositories_snapshot(spark, events), snapshot_lsn=299
        )


def test_snapshot_lsn_survives_compaction_and_later_merges(spark, tmp_path):
    n, cut = 1_000, 500
    events = change_stream(spark, n, n_repos=8, paths_per_repo=3)
    table = LakeTable(str(tmp_path / "t"), n_buckets=4)
    rep = Replayer(table=table, chain=Chain([]), epoch="e")
    rep.bootstrap(
        repositories_snapshot(spark, events.filter(F.col("value.lsn") < cut)),
        snapshot_lsn=cut - 1,
    )
    rep.replay(events, batch_width=(n + 3) // 4,
               start_pos=BASE_TS, max_pos=BASE_TS + n)
    table.compact(spark, max_files_per_bucket=1, all_buckets=True)
    assert table.extra() == {"snapshot_lsn": cut - 1}


def test_stale_pre_snapshot_delete_does_not_regress(spark, tmp_path):
    """The sharp edge the LSN fence exists for: a key deleted at LSN 5,
    re-created at LSN 9 (both pre-snapshot). The snapshot holds the
    re-created row; redelivering the stale delete after bootstrap must
    NOT remove it (source-wins merge would, without the fence)."""
    from pyspark.sql import types as T

    key_t = T.StructType([T.StructField("repo", T.StringType()),
                          T.StructField("path", T.StringType())])
    after_t = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    val_t = T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", after_t),
        T.StructField("after", after_t),
    ])
    schema = T.StructType([
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("key", key_t),
        T.StructField("value", val_t),
        T.StructField("timestamp", T.LongType()),
        T.StructField("headers",
                      T.MapType(T.StringType(), T.StringType())),
    ])

    def ev(op, lsn, content=None):
        after = ("r0", "p0", content) if content is not None else None
        return ("t", 0, ("r0", "p0"), (op, lsn, lsn, None, after), lsn, None)

    table = LakeTable(str(tmp_path / "t"), n_buckets=2)
    rep = Replayer(table=table, chain=Chain([]), epoch="e")
    snap = spark.createDataFrame(
        [("r0", "p0", "recreated")], ["repo", "path", "content"]
    )
    rep.bootstrap(snap, snapshot_lsn=10)

    stale = spark.createDataFrame([ev("d", 5)], schema)
    rep.apply_batch(stale, 0)
    rows = table.read(spark).collect()
    assert len(rows) == 1 and rows[0]["content"] == "recreated"

    # genuinely-new delete still applies
    fresh = spark.createDataFrame([ev("d", 11)], schema)
    rep.apply_batch(fresh, 1)
    assert table.read(spark).count() == 0


def test_snapshot_records_flow_through_the_chain(spark, tmp_path):
    """Debezium snapshot semantics: op='r' records pass the SMT chain
    like any event — a chain stage that rewrites value fields shapes
    the seeded table too."""
    chain = Chain([{
        "type": "concat_fields",
        "field.names": ["op", "lsn"],
        "output.field.name": "op_lsn",
        "delimiter": "@",
    }])
    snap = spark.createDataFrame(
        [("r0", "p0", "c0"), ("r1", "p1", "c1")],
        ["repo", "path", "content"],
    )
    table = LakeTable(str(tmp_path / "t"), n_buckets=2)
    rep = Replayer(table=table, chain=chain, epoch="e")
    rep.bootstrap(snap, snapshot_lsn=7)
    rows = {r["repo"]: r for r in table.read(spark).collect()}
    # the chain-added value column lands on the seeded rows too
    # (schema evolution via extra_fields), stamped from op='r' + the
    # snapshot LSN
    assert rows["r0"]["op_lsn"] == "r@7"
    assert rows["r1"]["op_lsn"] == "r@7"


def test_snapshot_envelope_shape(spark):
    snap = spark.createDataFrame(
        [("r0", "p0", "c0")], ["repo", "path", "content"]
    )
    env = snapshot_envelope(snap, ["repo", "path"], lsn=7, topic="boots")
    row = env.collect()[0]
    assert row["topic"] == "boots"
    assert row["key"]["repo"] == "r0" and row["key"]["path"] == "p0"
    assert row["value"]["op"] == "r"
    assert row["value"]["lsn"] == 7 and row["value"]["ts_ms"] == 7
    assert row["value"]["before"] is None
    assert row["value"]["after"]["content"] == "c0"
    assert row["timestamp"] == 7 and row["headers"] is None
    with pytest.raises(ValueError, match="missing key columns"):
        snapshot_envelope(snap, ["repo", "nope"], lsn=7)
